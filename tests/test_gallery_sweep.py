"""Registry-wide compute-function consistency sweep: every constructible
gallery entry must satisfy Mlincomb(lam, v) == Mder_dense(lam) @ v at a
benign evaluation point (the reference's core-protocol identity,
``test/core.jl:17-33``, applied across the whole registry instead of ad
hoc per problem)."""
import numpy as np
import pytest

from neptpu import compute_Mlincomb, nep_gallery

# (name, args, kwargs, evaluation point) — small configs; None lam means
# use the entry-specific default below
CASES = [
    ("dep0", (), {}, 0.3),
    ("dep0_sparse", (30,), {}, 0.3),
    ("dep0_tridiag", (64,), {}, 0.3),
    ("pep0", (20,), {}, 0.3),
    ("pep0_sym", (15,), {}, 0.3),
    ("pep0_sparse", (30,), {}, 0.3),
    ("qep_fixed_eig", (3,), {}, 0.3),
    ("dep1", (), {}, 0.3),
    ("dep_symm_double", (24,), {}, 0.3),
    ("dep_double", (), {}, 0.3),
    ("real_quadratic", (), {}, -3.0),
    ("qdep0", (), {}, 0.3),
    ("qdep1", (), {}, 0.3),
    ("neuron0", (), {}, 0.3),
    ("beam", (40,), {}, -1.0),
    ("sine", (), {}, 0.1),
    ("dep_distributed", (), {}, 0.3),
    ("schrodinger_movebc", (120,), {}, -3.0),
    ("gun_like", (), {}, 22000.0 + 100j),
    ("nlevp_native_cd_player", (), {}, 0.3),
    ("nlevp_native_fiber", (), {}, 1e-6),
    ("nlevp_native_hadeler", (200,), {}, 0.3),
    ("nlevp_native_pdde_stability", (20,), {}, 0.3),
    ("nlevp_native_loaded_string", (20,), {}, 1.3),
    ("periodicdde", (), {"name": "mathieu"}, -0.24),
    ("bem_fichera", (1,), {}, 3.0),
    ("orr_sommerfeld", (24,), {}, 0.3),
    ("waveguide", (), {"nx": 11, "nz": 9, "benchmark_problem": "TAUSCH",
                       "neptype": "SPMF"}, -1.0 - 1.0j),
]
# excluded: dtn_dimer (external data), nlevp_native_gun (data absent from
# the snapshot), nlevp bridge (opt-in MATLAB), waveguide neptype="WEP"
# (matrix-free by design: Mder raises — covered by tests/test_wep.py)


@pytest.mark.parametrize("name,args,kwargs,lam",
                         CASES, ids=[c[0] for c in CASES])
def test_registry_mlincomb_mder_consistency(name, args, kwargs, lam):
    try:
        nep = nep_gallery(name, *args, **kwargs)
    except FileNotFoundError:
        pytest.skip("gallery data not present")
    rng = np.random.default_rng(7)
    v = rng.standard_normal(nep.n)
    z1 = np.asarray(compute_Mlincomb(nep, lam, v[:, None], np.ones(1)))
    M = np.asarray(nep.Mder_dense(lam))
    z2 = M @ v
    den = max(np.linalg.norm(z2), np.linalg.norm(M) * np.linalg.norm(v) * 1e-30)
    assert np.linalg.norm(z1.ravel() - z2) / den < 5e-7, name
