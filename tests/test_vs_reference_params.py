"""Cross-validation of the learnable parametrizations against the
reference's `rigid_body_params.py` nn.Modules, executed directly (same
import mechanism as tests/test_vs_reference.py).

Two kinds of checks per parametrization:
- POINTWISE: copy identical unconstrained parameter values into the
  reference module and our pure function; constrained outputs must match
  everywhere in parameter space (same layout: [diag(3); tril (1,0),(2,0),
  (2,1)]).
- INIT ROUND TRIP: initialize both from the same physical value (a real
  iiwa link-2 inertia); both must reproduce it.

Also pins an upstream bug our implementation fixes: the reference's
TriangParam3DInertiaMatrixNet constructor crashes on every path
(rigid_body_params.py:211 passes `init_param=` to UnconstrainedTensor,
whose keyword is `init_tensor`, rigid_body_params.py:47), so both its
SVD-triangle init and its forward math are only reachable through our
reimplementation (models/parametrizations.py:157-220); the pointwise test
below assembles the reference module state by hand to still execute its
forward verbatim.
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REF_ROOT = "/root/reference"
_HERE = os.path.dirname(os.path.abspath(__file__))

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF_ROOT, "differentiable_robot_model")):
    pytest.skip("reference checkout not available", allow_module_level=True)

# APPEND (not prepend): the reference checkout contains top-level package
# names that must not shadow this repo's (e.g. its stale `experiments/`
# package vs our runnable one).
for p in (os.path.join(_HERE, "refstub"), REF_ROOT):
    if p not in sys.path:
        sys.path.append(p)

rbp = pytest.importorskip("differentiable_robot_model.rigid_body_params")

from differentiable_robot_model_tpu.models import parametrizations as P  # noqa: E402

# a real physical inertia: iiwa link 2 (URDF values, SPD, non-diagonal com)
IIWA_LINK2_INERTIA = np.array(
    [[0.05, 0.0, 0.0], [0.0, 0.018, 0.0], [0.0, 0.0, 0.044]]
)
# a generic SPD matrix with off-diagonals, for harder round trips
GENERIC_SPD = np.array(
    [[0.12, 0.01, -0.02], [0.01, 0.09, 0.015], [-0.02, 0.015, 0.15]]
)


def _np(x):
    return np.asarray(torch.as_tensor(x).detach(), dtype=np.float64)


class TestPointwise:
    """Same unconstrained params -> same constrained value as the
    reference modules."""

    def test_positive_scalar(self):
        net = rbp.PositiveScalar(min_val=0.25)
        ours = P.PositiveScalar(min_val=0.25)
        for raw in (-1.3, 0.0, 0.7, 4.2):
            with torch.no_grad():
                net.l.copy_(torch.tensor(raw))
            ref_val = float(net())
            our_val = float(ours.apply(jnp.asarray(raw)))
            assert np.isclose(our_val, ref_val, atol=1e-7), raw

    def test_symm3d(self):
        rng = np.random.default_rng(0)
        net = rbp.Symm3DInertiaMatrixNet()
        ours = P.Symm3DInertiaMatrix()
        for _ in range(4):
            l6 = rng.normal(0, 1.0, 6)
            with torch.no_grad():
                net.l.copy_(torch.tensor(l6, dtype=torch.float32))
            assert np.allclose(
                np.asarray(ours.apply(jnp.asarray(l6))), _np(net()), atol=1e-6
            )

    def test_symm_pos_def(self):
        rng = np.random.default_rng(1)
        bias = 1e-4
        net = rbp.SymmPosDef3DInertiaMatrixNet(bias=bias)
        ours = P.SymmPosDef3DInertiaMatrix(bias=bias)
        for _ in range(4):
            l6 = rng.normal(0, 0.5, 6)
            with torch.no_grad():
                net.l.copy_(torch.tensor(l6, dtype=torch.float32))
            assert np.allclose(
                np.asarray(ours.apply(jnp.asarray(l6))), _np(net()), atol=1e-6
            )

    def test_cov_parameterized(self):
        rng = np.random.default_rng(2)
        bias = 1e-5
        net = rbp.CovParameterized3DInertiaMatrixNet(bias=bias)
        ours = P.CovParameterized3DInertiaMatrix(bias=bias)
        for _ in range(4):
            l6 = rng.normal(0, 0.5, 6)
            with torch.no_grad():
                net.l.copy_(torch.tensor(l6, dtype=torch.float32))
            assert np.allclose(
                np.asarray(ours.apply(jnp.asarray(l6))), _np(net()), atol=1e-6
            )

    @staticmethod
    def _make_ref_triang_net(bias, ori, j1, j2, alpha_raw):
        """Assemble the reference TriangParam net WITHOUT its constructor:
        rigid_body_params.py:211 always passes `init_param=` to
        UnconstrainedTensor (keyword is `init_tensor`,
        rigid_body_params.py:47), so __init__ raises TypeError on every
        path. Building the module state by hand still executes the
        reference's forward math verbatim (rigid_body_params.py:222-242)."""
        net = rbp.TriangParam3DInertiaMatrixNet.__new__(
            rbp.TriangParam3DInertiaMatrixNet
        )
        torch.nn.Module.__init__(net)
        net._qdim = 3
        net._bias = bias
        net.inertia_ori_axis_angle = torch.nn.Parameter(
            torch.tensor(ori, dtype=torch.float32)
        )
        net.J1net = rbp.PositiveScalar(min_val=bias)
        net.J2net = rbp.PositiveScalar(min_val=bias)
        net.alpha_param_net = rbp.UnconstrainedTensor(
            dim1=1, dim2=1,
            init_tensor=torch.tensor([[alpha_raw]], dtype=torch.float32),
        )
        with torch.no_grad():
            net.J1net.l.copy_(torch.tensor(j1))
            net.J2net.l.copy_(torch.tensor(j2))
        net.J = net.R = net.inertia_mat = None
        return net

    def test_triang_param(self):
        rng = np.random.default_rng(3)
        bias = 1e-6
        ours = P.TriangParam3DInertiaMatrix(bias=bias)
        for _ in range(4):
            ori = rng.normal(0, 0.8, 3)
            j1, j2 = rng.normal(0, 0.5, 2)
            alpha_raw = rng.normal(0, 1.0)
            net = self._make_ref_triang_net(bias, ori, j1, j2, alpha_raw)
            params = {
                "ori": jnp.asarray(ori),
                "j1": jnp.asarray(j1),
                "j2": jnp.asarray(j2),
                "alpha": jnp.asarray(alpha_raw),
            }
            assert np.allclose(
                np.asarray(ours.apply(params)), _np(net()), atol=1e-5
            )


class TestInitFromValueRoundTrip:
    """Both implementations initialized from the same physical value must
    reproduce it."""

    @pytest.mark.parametrize("M", [IIWA_LINK2_INERTIA, GENERIC_SPD],
                             ids=["iiwa_link2", "generic_spd"])
    def test_symm_pos_def(self, M):
        bias = 1e-7
        net = rbp.SymmPosDef3DInertiaMatrixNet(
            bias=bias, init_param=torch.tensor(M, dtype=torch.float32)
        )
        ours = P.SymmPosDef3DInertiaMatrix(bias=bias, init_param=M)
        assert np.allclose(_np(net()), M, atol=1e-6)
        assert np.allclose(
            np.asarray(ours.apply(ours.init_value())), M, atol=1e-7
        )

    @pytest.mark.parametrize("M", [IIWA_LINK2_INERTIA, GENERIC_SPD],
                             ids=["iiwa_link2", "generic_spd"])
    def test_cov_parameterized(self, M):
        bias = 1e-7
        net = rbp.CovParameterized3DInertiaMatrixNet(
            bias=bias, init_param=torch.tensor(M, dtype=torch.float32)
        )
        ours = P.CovParameterized3DInertiaMatrix(bias=bias, init_param=M)
        assert np.allclose(_np(net()), M, atol=1e-6)
        assert np.allclose(
            np.asarray(ours.apply(ours.init_value())), M, atol=1e-7
        )

    def test_symm3d(self):
        M = GENERIC_SPD
        net = rbp.Symm3DInertiaMatrixNet(
            init_param=torch.tensor(M[None], dtype=torch.float32)
        )
        ours = P.Symm3DInertiaMatrix(init_param=M)
        assert np.allclose(_np(net()), M, atol=1e-7)
        assert np.allclose(
            np.asarray(ours.apply(ours.init_value())), M, atol=1e-9
        )

    def test_positive_scalar(self):
        net = rbp.PositiveScalar(init_param=torch.tensor(3.482))
        ours = P.PositiveScalar(init_param=3.482)
        assert np.isclose(float(net()), 3.482, atol=1e-6)
        assert np.isclose(
            float(ours.apply(ours.init_value())), 3.482, atol=1e-9
        )

    def test_triang_param_ours_works_reference_crashes(self):
        """The SVD triangle-inequality init: ours reproduces the matrix;
        the reference's constructor is broken upstream on EVERY path
        (rigid_body_params.py:211 passes `init_param=` to
        UnconstrainedTensor, whose keyword is `init_tensor`,
        rigid_body_params.py:47) — its forward math is only reachable
        through our reimplementation."""
        M = GENERIC_SPD
        bias = 1e-7
        ours = P.TriangParam3DInertiaMatrix(bias=bias, init_param=M)
        assert np.allclose(
            np.asarray(ours.apply(ours.init_value())), M, atol=1e-7
        )
        with pytest.raises(TypeError):
            rbp.TriangParam3DInertiaMatrixNet(
                bias=bias, init_param=torch.tensor(M, dtype=torch.float32)
            )
        with pytest.raises(TypeError):
            rbp.TriangParam3DInertiaMatrixNet(bias=bias)  # random init too
