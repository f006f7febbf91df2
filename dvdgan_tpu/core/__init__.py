from dvdgan_tpu.core import tree
from dvdgan_tpu.core import init
