"""qoc_tpu.optim - optimizers with host and fused on-device paths."""

from qoc_tpu.optim.adam import Adam
from qoc_tpu.optim.lbfgs import LBFGS
from qoc_tpu.optim.lbfgsb import LBFGSB
from qoc_tpu.optim.sgd import SGD

__all__ = ["Adam", "LBFGS", "LBFGSB", "SGD"]
