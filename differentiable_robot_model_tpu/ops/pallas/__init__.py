"""Hand-written Pallas TPU kernels for the hot compute paths.

Policy (SURVEY.md §7 step 4): every kernel is benchmarked against the best
XLA-compiled formulation of the same op; the faster one is the default for
that shape class. Kernels carry custom VJPs that reuse the XLA paths, so
differentiability is never lost.
"""


def tpu_kernels_available() -> bool:
    """True when Pallas TPU kernels can actually EXECUTE here: the default
    backend is a TPU, or `pltpu.force_tpu_interpret_mode()` is active (the
    CPU emulation the test suite uses). Solver engine dispatch uses this to
    resolve an explicit "pallas"/"fused" request to the XLA path off-TPU
    instead of failing at Mosaic lowering (round-4 verdict #7: a CPU
    validation mesh must be able to run a deployment config verbatim)."""
    import jax

    if jax.default_backend() == "tpu":
        return True
    try:
        from jax._src import config as _jcfg

        return (
            _jcfg.pallas_tpu_interpret_mode_context_manager.value is not None
        )
    except Exception:
        return False
