"""Component-level TPU microbenchmark for the docking hot path.

Times each piece of one MC step at L lanes with on-device repetition
(fori_loop with a data dependency), so dispatch/tunnel latency is
amortized away.  Prints one JSON line per component.

Env knobs:
  MICRO_LANES   total lanes (default 64)
  MICRO_REPS    on-device repetitions per timing (default 50)
  MICRO_WHICH   comma list of component names, default all
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.docking import DockingEngine, DockSettings, \
        _minimize_iters_heuristic
    from gnina_tpu.ops import cache_grid as cg
    from gnina_tpu.ops import fk, mc
    from gnina_tpu.ops.bfgs import MinimizeParams, bfgs
    from gnina_tpu.ops.energy import Box
    from gnina_tpu.types import Conf

    lanes = int(os.environ.get("MICRO_LANES", "64"))
    reps = int(os.environ.get("MICRO_REPS", "50"))
    which = os.environ.get("MICRO_WHICH", "")
    which = set(which.split(",")) if which else None

    data = "/root/reference/test/gnina/data"
    rec = ingest.Receptor.from_file(f"{data}/10gs_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{data}/10gs_lig.sdf")

    eng = DockingEngine(DockSettings(cnn_scoring="none"))
    lig_d, rec_d, box, max_layers, n = eng._prepare(rec, lig, center, size)
    lo, hi = np.asarray(box.lo), np.asarray(box.hi)
    grids = eng._populate_cache([lig], rec_d, lo, hi)
    jax.block_until_ready(grids.data)
    miniters = _minimize_iters_heuristic(lig, eng.settings)
    efn = eng._make_efn(max_layers)
    t = lig_d.num_torsion_slots
    dof_mask = jnp.arange(6 + t) < 6 + lig.num_torsions

    print(json.dumps({
        "fixture": "10gs", "lanes": lanes, "n_atoms_pad": n,
        "n_nodes": int(lig_d.parent.shape[0]), "t_pad": t,
        "pairs_pad": int(lig_d.pair_a.shape[0]),
        "rec_pad": int(rec_d.coords.shape[0]),
        "grid_shape": list(grids.data.shape), "max_layers": max_layers,
        "miniters": miniters,
        "grid_mb": round(grids.data.size * 4 / 1e6, 1),
    }))

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, lanes)
    conf0 = jax.vmap(lambda k: mc.randomize_conf(k, lig_d, box.lo, box.hi, t))(ks)
    coords0 = jax.vmap(lambda c: fk.fk_coords(lig_d, c, max_layers))(conf0)
    jax.block_until_ready(coords0)
    slope = 1e3
    v = jnp.array([10.0, 10.0, 10.0], jnp.float32)

    def timeit(name, make_body, carry0):
        """make_body: carry -> carry with the op applied (data-dependent)."""
        if which is not None and name not in which:
            return

        @jax.jit
        def run(carry):
            return jax.lax.fori_loop(0, reps, lambda i, c: make_body(c), carry)

        r = run(carry0)
        jax.block_until_ready(r)
        t0 = time.time()
        r = run(carry0)
        jax.block_until_ready(r)
        dt = time.time() - t0
        print(json.dumps({"component": name,
                          "us_per_call": round(1e6 * dt / reps, 1),
                          "total_s": round(dt, 3)}))

    # --- FK only -------------------------------------------------------
    def fk_body(carry):
        conf, acc = carry
        coords = jax.vmap(lambda c: fk.fk_coords(lig_d, c, max_layers))(conf)
        acc = acc + coords.sum()
        conf = conf._replace(position=conf.position + acc * 1e-30)
        return conf, acc

    timeit("fk", fk_body, (conf0, jnp.float32(0.0)))

    # --- trilinear grid fwd on coords -----------------------------------
    def grid_fwd_body(carry):
        coords, acc = carry
        e = jax.vmap(lambda cd: cg.cache_inter_energy(
            grids, cd, lig_d.types, lig_d.charges, lig_d.heavy_mask,
            slope, v[1]))(coords)
        acc = acc + e.sum()
        return coords + acc * 1e-30, acc

    timeit("grid_fwd", grid_fwd_body, (coords0, jnp.float32(0.0)))

    # --- trilinear grid value+grad wrt coords ----------------------------
    def grid_vg_body(carry):
        coords, acc = carry

        def f(cd):
            return cg.cache_inter_energy(grids, cd, lig_d.types,
                                         lig_d.charges, lig_d.heavy_mask,
                                         slope, v[1])

        e, g = jax.vmap(jax.value_and_grad(f))(coords)
        acc = acc + e.sum()
        return coords + g * 1e-30, acc

    timeit("grid_vg", grid_vg_body, (coords0, jnp.float32(0.0)))

    # --- intra pairs fwd -------------------------------------------------
    def pairs_body(carry):
        coords, acc = carry
        e = jax.vmap(lambda cd: efn.pairs_on_coords(lig_d, cd, v[0], v[2]))(coords)
        acc = acc + e.sum()
        return coords + acc * 1e-30, acc

    timeit("pairs_fwd", pairs_body, (coords0, jnp.float32(0.0)))

    # --- full eval fwd (FK+grid+pairs) -----------------------------------
    def grid_total(conf, vv):
        coords = fk.fk_coords(lig_d, conf, max_layers)
        e = cg.cache_inter_energy(grids, coords, lig_d.types, lig_d.charges,
                                  lig_d.heavy_mask, slope, vv[1])
        return e + efn.pairs_on_coords(lig_d, coords, vv[0], vv[2])

    def eval_fwd_body(carry):
        conf, acc = carry
        e = jax.vmap(lambda c: grid_total(c, v))(conf)
        acc = acc + e.sum()
        conf = conf._replace(position=conf.position + acc * 1e-30)
        return conf, acc

    timeit("eval_fwd", eval_fwd_body, (conf0, jnp.float32(0.0)))

    # --- full eval value+grad (the BFGS step cost) ------------------------
    def grid_deriv(conf, vv):
        def f(eps):
            return grid_total(fk.conf_with_increment_var(conf, eps), vv)

        return jax.value_and_grad(f)(jnp.zeros((6 + t,), jnp.float32))

    def eval_vg_body(carry):
        conf, acc = carry
        e, g = jax.vmap(lambda c: grid_deriv(c, v))(conf)
        acc = acc + e.sum()
        conf = conf._replace(position=conf.position + g[:, :3] * 1e-30)
        return conf, acc

    timeit("eval_vg", eval_vg_body, (conf0, jnp.float32(0.0)))

    # --- one BFGS minimization (miniters) ---------------------------------
    minpar = MinimizeParams(maxiters=miniters, type="fast",
                            fused_trials=False)

    def bfgs_body(carry):
        conf, acc = carry
        res = jax.vmap(lambda c: bfgs(
            lambda cc: grid_deriv(cc, v), c, minpar, dof_mask,
            f_val=lambda cc: grid_total(cc, v)))(conf)
        acc = acc + res.f0.sum()
        conf = jax.tree_util.tree_map(
            lambda a, b: a + (b - a) * 1e-30, conf, res.x)
        return conf, acc

    timeit("bfgs", bfgs_body, (conf0, jnp.float32(0.0)))

    # --- 10-trial batched line search alone (the inner cost driver) -------
    def trials_body(carry):
        conf, acc = carry

        def one(c):
            p = jnp.ones((6 + t,), jnp.float32) * 0.01
            alphas = 0.5 ** jnp.arange(10, dtype=jnp.float32)
            xs = jax.vmap(lambda a: fk.conf_increment(c, p, a))(alphas)
            return jax.vmap(lambda cc: grid_total(cc, v))(xs).sum()

        e = jax.vmap(one)(conf)
        acc = acc + e.sum()
        conf = conf._replace(position=conf.position + acc * 1e-30)
        return conf, acc

    timeit("trials10", trials_body, (conf0, jnp.float32(0.0)))

    # --- exact inter (non-grid) value+grad for comparison -----------------
    def exact_deriv(conf, vv):
        def f(eps):
            return efn.eval_energy(lig_d, rec_d,
                                   fk.conf_with_increment_var(conf, eps),
                                   box, slope, vv)

        return jax.value_and_grad(f)(jnp.zeros((6 + t,), jnp.float32))

    def exact_vg_body(carry):
        conf, acc = carry
        e, g = jax.vmap(lambda c: exact_deriv(c, v))(conf)
        acc = acc + e.sum()
        conf = conf._replace(position=conf.position + g[:, :3] * 1e-30)
        return conf, acc

    timeit("exact_vg", exact_vg_body, (conf0, jnp.float32(0.0)))


if __name__ == "__main__":
    main()
