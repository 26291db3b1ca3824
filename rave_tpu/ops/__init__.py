from .conv import Conv1d, ConvTranspose1d, Delay, StreamSetup
from .delay import get_padding, plan_conv, plan_conv_transpose
from .pqmf import PQMF
