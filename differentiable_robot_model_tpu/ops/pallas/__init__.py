"""Hand-written Pallas TPU kernels for the hot compute paths.

Policy (SURVEY.md §7 step 4): every kernel is benchmarked against the best
XLA-compiled formulation of the same op; the faster one is the default for
that shape class. Kernels carry custom VJPs that reuse the XLA paths, so
differentiability is never lost.
"""
