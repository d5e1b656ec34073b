"""Graph extensions (reference: pyGPs/GraphExtensions/): propagation
kernel, node kernels, precomputed-Gram utilities, re-exported flat so
``from pygps_tpu import graph; graph.propagationKernel(...)`` mirrors
the reference's ``graphKernels.propagationKernel`` surface."""

from pygps_tpu.graph.node_kernels import (diffKernel, psInvLapKernel,
                                          regLapKernel, rwKernel, vnKernel)
from pygps_tpu.graph.propagation import (normalizeKernel, propagationKernel,
                                         propagationKernel_sparse)
from pygps_tpu.graph.util import formKernelMatrix

__all__ = [
    "propagationKernel", "propagationKernel_sparse", "normalizeKernel",
    "diffKernel", "vnKernel", "rwKernel", "regLapKernel", "psInvLapKernel",
    "formKernelMatrix",
]
