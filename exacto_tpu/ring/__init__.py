"""Ring layer: emulated wide integer ops, modular/NTT/RNS polynomial kernels.

TPU-native counterpart of the reference's L0 ring layer
(/root/reference/src/ring/).
"""

from . import hostmath, wordops  # noqa: F401
