"""Resume helpers: read optimization state back from a save file.

The reference's resume story is manual — re-open the H5, pick a row, feed it
back as ``initial_controls`` (schroedingerdiscrete.py:164-168) — and Adam
moments are lost. These helpers package that workflow and pair with
``H5Checkpointer.save_optimizer_state`` / ``Adam.load_state_dict``.
"""

import numpy as np

import h5py
from filelock import FileLock, Timeout

__all__ = ["load_controls", "load_best_controls"]

_LOCK_TIMEOUT_S = 10


def _read(file_path, keys):
    lock_path = file_path + ".lock"
    try:
        with FileLock(lock_path, timeout=_LOCK_TIMEOUT_S):
            with h5py.File(file_path, "r") as f:
                return {key: np.asarray(f[key]) for key in keys if key in f}
    except Timeout:
        raise RuntimeError("Timeout locking {} for reading."
                           "".format(lock_path))


def load_controls(save_file_path, save_index=-1):
    """Controls from row ``save_index`` of a GRAPE save file (negative
    indices count from the end as usual). Returns (controls, error)."""
    data = _read(save_file_path, ("controls", "error"))
    return data["controls"][save_index], float(data["error"][save_index])


def load_best_controls(save_file_path):
    """Controls of the lowest-error saved row. Returns
    (controls, error, save_index) — feed the controls back into a
    ``grape_*`` call as ``initial_controls`` to resume."""
    data = _read(save_file_path, ("controls", "error"))
    index = int(np.argmin(data["error"]))
    return data["controls"][index], float(data["error"][index]), index
