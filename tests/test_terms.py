"""Unit tests for the empirical scoring terms against hand-computed values.

Mirrors the reference's formula definitions in gninasrc/lib/everything.h.
"""

import numpy as np
import pytest

from gnina_tpu.constants import DEFAULT_TABLE, VINARDO_TABLE, SminaType
from gnina_tpu.scoring import terms as T
from gnina_tpu.scoring.builtin import get_scoring_function
from gnina_tpu.scoring.weighted import curl

C_ALI = int(SminaType.AliphaticCarbonXSHydrophobe)
N_DON = int(SminaType.NitrogenXSDonor)
O_ACC = int(SminaType.OxygenXSAcceptor)
O_DA = int(SminaType.OxygenXSDonorAcceptor)


def params(*types):
    return T.gather_type_params(DEFAULT_TABLE, np.array(types, np.int32))


def test_gauss_at_optimal_distance():
    pa = params(C_ALI)
    pb = params(C_ALI)
    g = T.Gauss(offset=0.0, width=0.5)
    # optimal distance = 1.9 + 1.9 = 3.8 -> gauss = 1
    assert np.allclose(np.asarray(g.eval(pa, pb, np.float32(3.8))), 1.0)
    # one width away -> exp(-1)
    assert np.allclose(np.asarray(g.eval(pa, pb, np.float32(4.3))), np.exp(-1.0), atol=1e-6)


def test_repulsion_only_when_closer():
    pa, pb = params(C_ALI), params(C_ALI)
    rep = T.Repulsion()
    assert np.asarray(rep.eval(pa, pb, np.float32(4.0))) == 0.0
    assert np.allclose(np.asarray(rep.eval(pa, pb, np.float32(3.3))), 0.25, atol=1e-6)


def test_hydrophobic_slope_step():
    pa, pb = params(C_ALI), params(C_ALI)
    h = T.Hydrophobic(good=0.5, bad=1.5)
    # d - opt = 0.0 -> below good -> 1
    assert np.asarray(h.eval(pa, pb, np.float32(3.8))) == 1.0
    # halfway: d-opt = 1.0 -> 0.5
    assert np.allclose(np.asarray(h.eval(pa, pb, np.float32(4.8))), 0.5, atol=1e-6)
    # beyond bad -> 0
    assert np.asarray(h.eval(pa, pb, np.float32(5.5))) == 0.0
    # non-hydrophobic pair -> 0
    pn = params(N_DON)
    assert np.asarray(h.eval(pa, pn, np.float32(3.0))) == 0.0


def test_hbond_pairs():
    don, acc = params(N_DON), params(O_ACC)
    hb = T.NonDirHBond(good=-0.7, bad=0.0)
    # donor/acceptor at opt-0.7 -> 1
    opt = DEFAULT_TABLE.xs_radius[N_DON] + DEFAULT_TABLE.xs_radius[O_ACC]
    assert np.allclose(np.asarray(hb.eval(don, acc, np.float32(opt - 0.7))), 1.0)
    # symmetric
    assert np.allclose(np.asarray(hb.eval(acc, don, np.float32(opt - 0.7))), 1.0)
    # donor-donor -> 0
    assert np.asarray(hb.eval(don, don, np.float32(opt - 0.7))) == 0.0


def test_anti_hbond_mask():
    don, acc, da = params(N_DON), params(O_ACC), params(O_DA)
    t = T.NonDirAntiHBondQuadratic()
    r = np.float32(1.0)
    assert np.asarray(t.eval(don, don, r)) > 0.0
    assert np.asarray(t.eval(acc, acc, r)) > 0.0
    assert np.asarray(t.eval(don, acc, r)) == 0.0
    # donor-acceptor (both flags) is not "strict" -> excluded
    assert np.asarray(t.eval(da, da, r)) == 0.0


def test_vdw_minimum_at_optimal_distance():
    pa, pb = params(C_ALI), params(C_ALI)
    v = T.Vdw(i=6, j=12, smoothing=0.0, cap=100.0)
    d0 = 3.8
    val_opt = np.asarray(v.eval(pa, pb, np.float32(d0)))
    assert np.allclose(val_opt, -1.0, atol=1e-5)  # depth = 1
    assert np.asarray(v.eval(pa, pb, np.float32(d0 + 0.5))) > val_opt
    # cap at tiny r
    assert np.asarray(v.eval(pa, pb, np.float32(0.01))) == 100.0


def test_vdw_smoothing_flattens_well():
    pa, pb = params(C_ALI), params(C_ALI)
    v = T.Vdw(i=6, j=12, smoothing=1.0, cap=100.0)
    # within +-smoothing of d0 the value is the minimum
    for r in (2.9, 3.8, 4.7):
        assert np.allclose(np.asarray(v.eval(pa, pb, np.float32(r))), -1.0, atol=1e-5)


def test_electrostatic_and_solvation():
    pa, pb = params(N_DON), params(O_ACC)
    es = T.Electrostatic(power=1, cap=100.0)
    v = np.asarray(es.eval(pa, pb, np.float32(2.0), qa=np.float32(0.5), qb=np.float32(-0.3)))
    assert np.allclose(v, 0.5 * -0.3 / 2.0, atol=1e-6)

    sol = T.AD4Solvation(desolvation_sigma=3.6, solvation_q=0.01097)
    r = np.float32(2.0)
    qa, qb = np.float32(0.2), np.float32(-0.4)
    df = np.exp(-((2.0 / 7.2) ** 2))
    expect = (
        DEFAULT_TABLE.ad_solvation[N_DON] * DEFAULT_TABLE.ad_volume[O_ACC]
        + DEFAULT_TABLE.ad_solvation[O_ACC] * DEFAULT_TABLE.ad_volume[N_DON]
        + 0.01097 * (0.2 * DEFAULT_TABLE.ad_volume[O_ACC] + 0.4 * DEFAULT_TABLE.ad_volume[N_DON])
    ) * df
    assert np.allclose(np.asarray(sol.eval(pa, pb, r, qa=qa, qb=qb)), expect, rtol=1e-5)


def test_parse_roundtrip_builtins():
    for name in ("vina", "vinardo", "dkoes_scoring", "ad4_scoring", "dkoes_fast"):
        sf = get_scoring_function(name)
        assert sf.cutoff == 8.0
        assert len(sf.pair_terms) >= 1


def test_vina_scoring_known_pair():
    """Weighted vina terms on a carbon-carbon pair at r=4.0."""
    sf = get_scoring_function("vina")
    pa, pb = params(C_ALI), params(C_ALI)
    r = np.float32(4.0)
    d = 4.0 - 3.8
    expect = (
        -0.035579 * np.exp(-((d / 0.5) ** 2))
        + -0.005156 * np.exp(-(((d - 3.0) / 2.0) ** 2))
        + 0.840245 * 0.0
        + -0.035069 * (1.0 - (d - 0.5) / (1.5 - 0.5) if 0.5 < d < 1.5 else (1.0 if d <= 0.5 else 0.0))
        + 0.0
    )
    got = np.asarray(sf.eval_pair(pa, pb, r))
    assert np.allclose(got, expect, rtol=1e-5)


def test_conf_independent_num_tors_div():
    sf = get_scoring_function("vina")
    inputs = {"num_tors": np.float32(4.0), "num_heavy_atoms": np.float32(20.0),
              "num_hydrophobic_atoms": np.float32(10.0), "ligand_lengths_sum": np.float32(9.0),
              "num_ligands": np.float32(1.0)}
    e = np.float32(-10.0)
    w = 5 * 0.05846 / 0.1 - 1
    wv = 0.1 * (w + 1)
    expect = -10.0 / (1 + wv * 4.0 / 5.0)
    got = np.asarray(sf.conf_independent(inputs, e))
    assert np.allclose(got, expect, rtol=1e-6)


def test_curl():
    assert np.allclose(np.asarray(curl(np.float32(1000.0), np.float32(1000.0))), 500.0)
    assert np.asarray(curl(np.float32(-5.0), np.float32(1000.0))) == -5.0
    # v=0 -> positive energies crushed to 0
    assert np.asarray(curl(np.float32(5.0), np.float32(0.0))) == 0.0
    # huge v (authentic no-cap) -> identity, finite
    big = np.float32(np.finfo(np.float32).max)
    assert np.allclose(np.asarray(curl(np.float32(5.0), big)), 5.0)


def test_vinardo_table_differs():
    assert VINARDO_TABLE.xs_radius[C_ALI] == 2.0
    assert DEFAULT_TABLE.xs_radius[C_ALI] == np.float32(1.9)
    assert VINARDO_TABLE.xs_hydrophobe[int(SminaType.SulfurAcceptor)]
    assert not DEFAULT_TABLE.xs_hydrophobe[int(SminaType.SulfurAcceptor)]


def test_batched_eval():
    sf = get_scoring_function("vina")
    types_a = np.array([C_ALI, N_DON, O_ACC], np.int32)
    types_b = np.array([C_ALI, O_ACC, O_ACC], np.int32)
    pa = T.gather_type_params(DEFAULT_TABLE, types_a)
    pb = T.gather_type_params(DEFAULT_TABLE, types_b)
    r = np.array([3.8, 2.8, 3.4], np.float32)
    out = np.asarray(sf.eval_pair(pa, pb, r))
    assert out.shape == (3,)
    for i in range(3):
        pai = T.gather_type_params(DEFAULT_TABLE, types_a[i : i + 1])
        pbi = T.gather_type_params(DEFAULT_TABLE, types_b[i : i + 1])
        one = np.asarray(sf.eval_pair(pai, pbi, r[i : i + 1]))
        assert np.allclose(out[i], one[0], rtol=1e-6)
