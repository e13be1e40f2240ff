"""TPU data-movement kernels (Pallas).

The FFV1 device pipeline is data-movement bound: XLA's sort/scatter
codegen runs 15-30x off the VPU/HBM roofline at the pipeline's shapes
(docs/ARCHITECTURE.md, measured).  This package holds the Pallas
replacements:

* ``sort_pallas`` — multi-operand bitonic sort, VMEM-resident per row
  block with a hierarchical chunked variant for arrays past VMEM.
"""

from .sort_pallas import sort_rows_pallas  # noqa: F401
