"""Float64 oracle parity for the evaluator library (BASELINE metric:
"energy/force parity <= 1e-5 vs reference evaluators").

Each potential is re-implemented here in independent numpy float64
(transcribed from the reference formulas, not from the engine code) and
compared against the engine's f32 jnp evaluators over a dense sweep of
separations. SURVEY §7 hard part #2 prescribes exactly this oracle
pattern. Colloid's near-contact 1/(r-a)^7 algebra is checked away from
the contact singularity where f32 cancellation is intrinsic (documented
in DEVIATIONS.md §1).
"""

import numpy as np
import jax.numpy as jnp

from azplugins_tpu.ops.evaluators.pair import PAIR_POTENTIALS
from azplugins_tpu.ops.evaluators.bond import BOND_POTENTIALS

RTOL = 1e-5


def _check(name, got_e, got_f, ref_e, ref_f):
    # parity relative to the sweep's scale: pointwise relative error is
    # meaningless at the zero crossings of f(r) (the absolute f32 error
    # there is set by the large terms that cancel, not by |f|)
    scale_e = np.maximum(np.abs(ref_e), 2e-2 * np.abs(ref_e).max())
    scale_f = np.maximum(np.abs(ref_f), 2e-2 * np.abs(ref_f).max())
    np.testing.assert_array_less(
        np.abs(got_e - ref_e) / scale_e, RTOL, err_msg=f"{name} energy"
    )
    np.testing.assert_array_less(
        np.abs(got_f - ref_f) / scale_f, RTOL, err_msg=f"{name} force"
    )


def _eval_engine(name, params, r, rcut=3.0, kind="pair"):
    reg = PAIR_POTENTIALS if kind == "pair" else BOND_POTENTIALS
    d = reg[name]
    p = {k: jnp.float32(v) for k, v in d.precompute(params).items()}
    rsq = jnp.asarray((r * r).astype(np.float32))
    if kind == "pair":
        e, f = d.energy_force(rsq, jnp.float32(rcut * rcut), p)
    else:
        e, f = d.energy_force(rsq, p)
    return np.asarray(e, np.float64), np.asarray(f, np.float64)


def test_perturbed_lj_oracle():
    # reference: PairEvaluatorPerturbedLennardJones.h:117-155
    eps, sig, lam = 1.0, 1.0, 0.5
    r = np.linspace(0.9, 2.9, 400, dtype=np.float64)
    lj1 = 4 * eps * sig**12
    lj2 = 4 * eps * sig**6
    r6 = r**-6
    e = r6 * (lj1 * r6 - lj2)
    f = (12 * lj1 * r6 - 6 * lj2) * r6 / r**2
    in_core = r < 2.0 ** (1 / 6) * sig
    e = np.where(in_core, e + eps * (1 - lam), e * lam)
    f = np.where(in_core, f, f * lam)
    ge, gf = _eval_engine(
        "PerturbedLennardJones",
        dict(epsilon=eps, sigma=sig, attraction_scale_factor=lam),
        r,
    )
    _check("plj", ge, gf, e, f)


def test_expanded_yukawa_oracle():
    # reference: PairEvaluatorExpandedYukawa.h:92-115
    eps, kappa, delta = 1.5, 2.0, 0.3
    r = np.linspace(0.8, 2.9, 400, dtype=np.float64)
    rd = r - delta
    e = eps * np.exp(-kappa * rd) / rd
    f = e * (kappa + 1 / rd) / r
    ge, gf = _eval_engine(
        "ExpandedYukawa", dict(epsilon=eps, kappa=kappa, delta=delta), r
    )
    _check("yukawa", ge, gf, e, f)


def test_hertz_oracle():
    # reference: PairEvaluatorHertz.h:93-110
    eps, rcut = 2.0, 3.0
    r = np.linspace(0.3, 2.9, 400, dtype=np.float64)
    x = 1 - r / rcut
    e = eps * x ** 2.5
    f = 2.5 * eps * x ** 1.5 / (r * rcut)
    ge, gf = _eval_engine("Hertz", dict(epsilon=eps), r, rcut=rcut)
    _check("hertz", ge, gf, e, f)


def test_dpd_conservative_oracle():
    # reference: DPDPairEvaluatorGeneralWeight.h:165-183
    A, rcut = 25.0, 1.0
    r = np.linspace(0.05, 0.99, 300, dtype=np.float64)
    f = A * (1 / r - 1 / rcut)
    e = A * (rcut - r) - 0.5 * A / rcut * (rcut**2 - r**2)
    ge, gf = _eval_engine(
        "DPDGeneralWeight", dict(A=A, gamma=4.5, s=2.0), r, rcut=rcut
    )
    _check("dpd", ge, gf, e, f)


def test_colloid_solvent_oracle():
    # reference: PairEvaluatorColloid.h:101-113 (solvent-solvent branch)
    A, sig = 100.0, 1.05
    r = np.linspace(0.95, 2.9, 300, dtype=np.float64)
    s6 = sig**6
    r6 = r**-6
    c1 = A * s6 / 36.0
    e = c1 * r6 * (s6 * r6 - 1)
    f = 6 * c1 * r6 * (2 * s6 * r6 - 1) / r**2
    ge, gf = _eval_engine(
        "Colloid", dict(A=A, a_1=0.0, a_2=0.0, sigma=sig), r
    )
    _check("colloid-ss", ge, gf, e, f)


def test_colloid_sphere_sphere_oracle():
    # reference: PairEvaluatorColloid.h:164-220 (Everaers-Ejtehadi),
    # float64 transcription of the published algebra; checked away from
    # contact where the k-polynomials are well-conditioned
    A, sig, a1, a2 = 100.0, 1.0, 1.5, 1.0
    r = np.linspace(2.8, 5.5, 300, dtype=np.float64)
    s6 = sig**6
    k0 = a1 * a2
    k1 = a1 + a2
    k2 = a1 - a2
    k3, k4, k5, k6 = k1 + r, k1 - r, k2 + r, k2 - r
    k7 = 1 / (k3 * k4)
    k8 = 1 / (k5 * k6)
    g0, g1, g2, g3 = k3**-7, k4**-7, k5**-7, k6**-7
    h0 = ((k3 + 5 * k1) * k3 + 30 * k0) * g0
    h1 = ((k4 + 5 * k1) * k4 + 30 * k0) * g1
    h2 = ((k5 + 5 * k2) * k5 - 30 * k0) * g2
    h3 = ((k6 + 5 * k2) * k6 - 30 * k0) * g3
    g0 = g0 * (42 * k0 / k3 + 6 * k1 + k3)
    g1 = g1 * (42 * k0 / k4 + 6 * k1 + k4)
    g2 = g2 * (-42 * k0 / k5 + 6 * k2 + k5)
    g3 = g3 * (-42 * k0 / k6 + 6 * k2 + k6)
    fR = A * s6 / r / 37800.0
    e_rep = fR * (h0 - h1 - h2 + h3)
    dUR = e_rep / r + 5 * fR * (g0 + g1 - g2 - g3)
    dUA = -A / 3 * r * ((2 * k0 * k7 + 1) * k7 + (2 * k0 * k8 - 1) * k8)
    f = (dUR + dUA) / r
    e = e_rep + A / 6 * (2 * k0 * (k7 + k8) - np.log(k8 / k7))
    ge, gf = _eval_engine(
        "Colloid", dict(A=A, a_1=a1, a_2=a2, sigma=sig), r, rcut=6.0
    )
    # wider tolerance: the h/g polynomial differences lose ~3 digits in
    # f32 even away from contact (documented, DEVIATIONS.md §1)
    scale_e = np.maximum(np.abs(e), 1e-3)
    scale_f = np.maximum(np.abs(f), 1e-3)
    assert (np.abs(ge - e) / scale_e).max() < 5e-4
    assert (np.abs(gf - f) / scale_f).max() < 5e-4


def test_double_well_oracle():
    # reference: BondEvaluatorDoubleWell.h:96-113
    r0, r1, U1, Ut = 1.0, 2.0, 5.0, 0.25
    r = np.linspace(0.5, 3.4, 300, dtype=np.float64)
    rd = r1 - r0
    x = (r1 - r) / rd
    e = U1 * (1 - x * x) ** 2 + Ut * (1 - x - (1 - x * x) ** 2)
    # force from the analytic derivative: F = -dU/dr = dU/dx / rd
    dU_dx = -4 * U1 * x * (1 - x * x) + Ut * (-1 + 4 * x * (1 - x * x))
    f = dU_dx / rd
    d = BOND_POTENTIALS["DoubleWell"]
    p = {k: jnp.float32(v) for k, v in d.precompute(
        dict(r_0=r0, r_1=r1, U_1=U1, U_tilt=Ut)
    ).items()}
    ge, gfdivr = d.energy_force(jnp.asarray((r * r).astype(np.float32)), p)
    gf = np.asarray(gfdivr, np.float64) * r  # force magnitude along r
    _check("double_well", np.asarray(ge, np.float64), gf, e, f)
