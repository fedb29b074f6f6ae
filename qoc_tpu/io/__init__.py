"""qoc_tpu.io - checkpointing, save files, serialization (observer layer)."""

from qoc_tpu.io.fileutil import generate_save_file_path
from qoc_tpu.io.h5 import H5Checkpointer
from qoc_tpu.io.jsonutil import CustomJSONEncoder
from qoc_tpu.io.resume import load_best_controls, load_controls

__all__ = ["generate_save_file_path", "H5Checkpointer", "CustomJSONEncoder",
           "load_controls", "load_best_controls"]
