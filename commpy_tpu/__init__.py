"""commpy_tpu — a TPU-native digital-communications framework.

A from-scratch JAX/XLA/Pallas redesign with the full capability set of
scikit-commpy (veeresht/CommPy v0.8.0): modems, channels, FEC
(convolutional/Viterbi, turbo/BCJR, LDPC/BP), pulse shaping, OFDM, MIMO
detection, and Monte-Carlo link simulation — batched, functional, and
sharded over device meshes instead of scalar Python loops.

Layout
------
``commpy_tpu.ops``       batched device kernels (modem, channels, FEC, DSP)
``commpy_tpu.parallel``  mesh / sharding / Monte-Carlo driver
``commpy_tpu.models``    link models and PHY applications (802.11)
``commpy_tpu.utils``     bit packing, distances, host helpers
``commpy_tpu.kernels``   Pallas TPU kernels for the hottest inner loops

Reference-compatible modules (``commpy_tpu.modulation``,
``commpy_tpu.channels``, ``commpy_tpu.links``, ``commpy_tpu.channelcoding``,
...) mirror the CommPy API surface one-to-one so existing users can switch
imports; they are thin shims over the batched kernels.
"""

__version__ = "0.1.0"

from . import utils, ops  # noqa: F401  (core layers always importable)

# Reference-parity star exports (commpy/__init__.py:17-21 imports filters,
# modulation, impairments, sequences, channels at top level).
from .filters import *  # noqa: F401,F403
from .modulation import *  # noqa: F401,F403
from .impairments import *  # noqa: F401,F403
from .sequences import *  # noqa: F401,F403
from .channels import *  # noqa: F401,F403
