"""AOT memory analysis of the 128^3 composed-l1 MG build (VERDICT r4 #4).

The mg-build phase of scripts/bench_mg_solve.py --res 128 runtime-OOMs
with a dump-less RESOURCE_EXHAUSTED through the tunnel. This compiles the
SAME build_precond program (plus, optionally, its pieces) WITHOUT
executing and prints XLA's memory analysis: argument / output / temp /
total bytes — pinning which allocation class to shrink.

Usage: python scripts/probe_mg_build_mem.py [--res 128] [--levels 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--ppc", type=int, default=8)
    ap.add_argument("--from-level", type=int, default=1)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from hot_tpu.ops import transfer
    from hot_tpu.scenes import build_scene, stress_state
    from hot_tpu.sim import capacity, collision
    from hot_tpu.sim import objective as obj_mod
    from hot_tpu.solver import multigrid as mg_mod
    from hot_tpu.utils.cache import enable_compilation_cache
    from hot_tpu.utils.config import MultigridConfig

    enable_compilation_cache()
    scene = build_scene("twisting_bar_3d", res=args.res, ppc=args.ppc)
    cfg = scene["cfg"]
    state = stress_state(scene["state"], cfg)
    model = scene["model"]
    dim = cfg.dim
    res = cfg.grid_res[:dim]
    dx = cfg.dx
    n_nodes = transfer.n_nodes_of(res)
    dt = jnp.asarray(2e-3, state.x.dtype)

    mgc = MultigridConfig(levels=args.levels, smoother="chebyshev",
                          coarse_solver="direct", assembled=True,
                          coarsening="galerkin",
                          assembled_from_level=args.from_level)
    sol = dataclasses.replace(cfg.solver, preconditioner="multigrid",
                              multigrid=mgc)
    cfg_mg = dataclasses.replace(cfg, solver=sol)
    plan = capacity.plan_capacities(cfg_mg, state.x)
    mgc = dataclasses.replace(mgc, coarse_capacity=plan.mg_coarse_cap)

    st = jax.jit(lambda x: transfer.particle_stencil(x, dx, res))(state.x)
    gm, gmv = jax.jit(lambda st_, v, C, m: transfer.p2g_mass_momentum(
        st_, v, C, m, n_nodes))(st, state.v, state.C, state.m)
    active = gm > 0
    vg = gmv * jnp.where(active, 1.0 / jnp.maximum(gm, 1e-30), 0.0)[:, None]
    node_pos = transfer.node_positions(res, dx, state.x.dtype)
    proj, v_bc, constrained = collision.grid_boundary_conditions(
        node_pos, 0.0, scene["colliders"], grid_v=vg, boundary_margin=2,
        res=res, dx=dx)
    v0 = collision.apply_bc_to_velocity(vg, proj, v_bc)
    obj = jax.jit(lambda st_, F, V0, mu, lam, gm_, v0_, proj_:
                  obj_mod.make_objective(model, st_, F, V0, mu, lam, gm_,
                                         v0_, proj_, dt, dx))(
        st, state.F, state.V0, state.mu, state.lam, gm, v0, proj)
    _, hess = jax.jit(lambda o, v: obj_mod.linearize(
        model, o, v, fused=(jax.default_backend() == "tpu")))(obj, v0)
    ctx = hess.ctx

    t0 = time.perf_counter()
    mg_static = jax.jit(lambda x, m, c: mg_mod.build_static(
        x, m, res, dx, mgc.levels, c, state.x.dtype,
        bin_caps=plan.bin_caps, mg_tile_caps=plan.mg_tile_caps,
        mg_bin_caps=plan.mg_bin_caps,
        assembled_from=mgc.assembled_from_level,
        mg_composed_caps=plan.mg_composed_caps,
        mg_ncomposed_caps=plan.mg_ncomposed_caps))(
        state.x, state.m, constrained)
    jax.block_until_ready(mg_static.levels[0].grid_m)
    print(f"[static] {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def report(name, lowered):
        c = lowered.compile()
        m = c.memory_analysis()
        out = {"probe": name}
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes",
                  "alias_size_in_bytes"):
            v = getattr(m, k, None)
            if v is not None:
                out[k.replace("_in_bytes", "_mb")] = round(v / 2**20, 1)
        tot = (getattr(m, "argument_size_in_bytes", 0)
               + getattr(m, "output_size_in_bytes", 0)
               + getattr(m, "temp_size_in_bytes", 0))
        out["total_gb"] = round(tot / 2**30, 2)
        print(json.dumps(out), flush=True)
        return c

    # the full per-Newton build (PROBE_SKIP_FULL=1 to probe pieces only —
    # a compile-helper crash on the full program would otherwise mask them)
    if os.environ.get("PROBE_SKIP_FULL") != "1":
        t0 = time.perf_counter()
        lowered = jax.jit(lambda mg_, F, c, V0: mg_mod.build_precond(
            mg_, F, c, V0, dt, mgc, dim)).lower(mg_static, state.F, ctx,
                                                state.V0)
        print(f"[lower] {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        t0 = time.perf_counter()
        try:
            report("build_precond", lowered)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": "build_precond",
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)
        print(f"[compile] {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # the composed level-1 assembly alone
    from hot_tpu.ops import composed as comp_mod

    lvl = mg_static.levels[args.from_level]
    if lvl.comp is not None:
        lowered1 = jax.jit(
            lambda lv, F, cx, V0: comp_mod.assemble_composed_galerkin(
                lv.mat_sym, args.from_level, lv.res, F, cx, V0, dt,
                lv.comp.node_coords, lv.comp.node_m, lv.comp.p_bins,
                lv.comp.n_bins, lv.comp.comp_w, lv.comp.comp_dw,
                tgrid=(lv.tgrid if lv.compact else None))
        ).lower(lvl, state.F, ctx, state.V0)
        report("composed_l1_assembly", lowered1)

        # ---- piece bisection: which half owns the temps ----------------
        import jax.numpy as jnp2
        from hot_tpu.ops import bsr as bsr_mod
        from hot_tpu.ops.bspline import tensor_weights

        def elastic_blocks(lv, F, cx, V0):
            wn, gwn = tensor_weights(lv.comp.comp_w, lv.comp.comp_dw,
                                     impl="flat")
            st_c = transfer.Stencil(
                node_ids=jnp2.zeros(wn.shape, jnp2.int32), wn=wn, gwn=gwn,
                rel=jnp2.zeros(gwn.shape, wn.dtype))
            return bsr_mod.cell_mode_blocks(lv.comp.p_bins, st_c, F, cx,
                                            V0, dt, dim)

        report("elastic_cell_blocks",
               jax.jit(elastic_blocks).lower(lvl, state.F, ctx, state.V0))

        def elastic_full(lv, F, cx, V0):
            blocks = elastic_blocks(lv, F, cx, V0)
            mat = lv.mat_sym
            width = lv.comp.comp_w.shape[-1]
            cells_cap = lv.comp.p_bins.p_cell.shape[0]
            vals = jnp2.zeros((mat.n_rows + cells_cap, mat.K, dim * dim),
                              blocks.dtype)
            return comp_mod._scatter_cell_blocks(
                vals, blocks, lv.comp.p_bins, lv.res, mat,
                lv.tgrid if lv.compact else None, width, mat.half)

        report("elastic_blocks_plus_scatter",
               jax.jit(elastic_full).lower(lvl, state.F, ctx, state.V0))

        def mass_part(lv):
            c = lv.comp
            mat = lv.mat_sym
            nb, nw = comp_mod.composed_node_weights(
                c.node_coords, args.from_level, c.comp_w.dtype)
            wn_n = comp_mod._tensor_w(nw)
            sm = wn_n.shape[-1]
            m_rt = jnp2.sqrt(jnp2.maximum(c.node_m, 0.0))
            rows_w = m_rt[:, None] * wn_n
            n = rows_w.shape[0]
            packed = jnp2.concatenate(
                [rows_w, jnp2.zeros((1, sm), rows_w.dtype)], axis=0)
            slot_rows = packed[c.n_bins.p_cell.reshape(-1)]
            slot_rows = transfer.barrier(slot_rows)
            ncells_cap, cap_n = c.n_bins.p_cell.shape
            W = slot_rows.reshape(ncells_cap, cap_n, sm)
            Bm = jnp2.einsum("xqa,xqb->xab", W, W).reshape(
                ncells_cap, sm * sm)
            m_width = int(round(sm ** (1.0 / dim)))
            scal = jnp2.zeros((mat.n_rows + ncells_cap, mat.K), Bm.dtype)
            return comp_mod._scatter_cell_scalars(
                scal, Bm, c.n_bins, lv.res, mat,
                lv.tgrid if lv.compact else None, m_width, mat.half)

        report("mass_part", jax.jit(mass_part).lower(lvl))

        def elastic_fused(lv, F, cx, V0):
            wn, gwn = tensor_weights(lv.comp.comp_w, lv.comp.comp_dw,
                                     impl="flat")
            st_c = transfer.Stencil(
                node_ids=jnp2.zeros(wn.shape, jnp2.int32), wn=wn, gwn=gwn,
                rel=jnp2.zeros(gwn.shape, wn.dtype))
            mat = lv.mat_sym
            width = lv.comp.comp_w.shape[-1]
            s_el = width ** dim
            cells_cap = lv.comp.p_bins.p_cell.shape[0]
            offs_el, off_id_el = comp_mod._offset_tables(dim, width,
                                                         mat.half)
            dump_rows = mat.n_rows + jnp2.arange(cells_cap, dtype=jnp2.int32)
            rows_j = []
            for j in range(s_el):
                r_j = comp_mod._rows_for_cells(
                    lv.comp.p_bins.active_cells, offs_el[j], lv.res, mat,
                    lv.tgrid if lv.compact else None)
                rows_j.append(jnp2.where(r_j >= 0, r_j, dump_rows))
            rows_j = jnp2.stack(rows_j, axis=0)
            vals = jnp2.zeros((mat.n_rows + cells_cap, mat.K, dim * dim),
                              wn.dtype)
            return bsr_mod.cell_mode_blocks_scatter(
                lv.comp.p_bins, st_c, F, cx, V0, dt, dim, vals, rows_j,
                off_id_el)

        report("elastic_fused_scatter",
               jax.jit(elastic_fused).lower(lvl, state.F, ctx, state.V0))

        # ---- the REST of build_precond: RAP chain + diag/lmax ----------
        from hot_tpu.ops import spgemm

        mat_l1 = jax.jit(
            lambda lv, F, cx, V0: comp_mod.assemble_composed_galerkin(
                lv.mat_sym, args.from_level, lv.res, F, cx, V0, dt,
                lv.comp.node_coords, lv.comp.node_m, lv.comp.p_bins,
                lv.comp.n_bins, lv.comp.comp_w, lv.comp.comp_dw,
                tgrid=(lv.tgrid if lv.compact else None))
        )(lvl, state.F, ctx, state.V0)
        jax.block_until_ready(mat_l1.vals)

        def rap_chain(m1):
            mats = [m1]
            prev = m1
            for l in range(args.from_level + 1, args.levels):
                lv2 = mg_static.levels[l]
                if lv2.compact:
                    prev = spgemm.rap(prev, lv2.res, None, 0,
                                      coarse_tgrid=lv2.tgrid,
                                      max_half=mgc.rap_max_half)
                else:
                    cap = lv2.mat_sym.n_rows
                    if l == args.levels - 1 and mgc.coarse_capacity:
                        cap = int(mgc.coarse_capacity)
                    prev = spgemm.rap(prev, lv2.res, lv2.active, cap,
                                      max_half=mgc.rap_max_half)
                mats.append(prev)
            return tuple(m.vals for m in mats[1:])

        report("rap_chain", jax.jit(rap_chain).lower(mat_l1))

        def l0_smoother_data(F, cx, V0):
            return mg_mod._level_smoother_data(
                mg_static.levels[0], None, F, cx, V0, dt, mgc, True, dim)

        report("l0_diag_lmax",
               jax.jit(l0_smoother_data).lower(state.F, ctx, state.V0))
        lv0 = mg_static.levels[0]
        print(json.dumps({"probe": "l0_info",
                          "bins": lv0.bins is not None,
                          "compact": bool(lv0.compact)}), flush=True)

        def l0_diag_only(F, cx, V0):
            lv0 = mg_static.levels[0]
            D = obj_mod.elastic_block_diag(
                lv0.stencil, F, cx, V0, dt, lv0.grid_m, lv0.active, dim,
                scatter=lv0.scatter, flat=True)
            return obj_mod.sym_block_inv_flat(D, dim)

        report("l0_diag_only",
               jax.jit(l0_diag_only).lower(state.F, ctx, state.V0))

        def l0_lmax_only(Dinv, F, cx, V0):
            lv0 = mg_static.levels[0]
            mul, proj = mg_mod._level_ops_dense(lv0, F, cx, V0, dt)
            v0p = lv0.free[:, None] * jnp2.ones((1, dim), F.dtype)
            return mg_mod._power_iteration_lmax(mul, proj, Dinv, v0p,
                                                mgc.power_iters)

        Dinv0 = jnp2.zeros((mg_static.levels[0].grid_m.shape[0], dim * dim),
                           state.F.dtype)
        report("l0_lmax_only",
               jax.jit(l0_lmax_only).lower(Dinv0, state.F, ctx, state.V0))

        def l0_one_apply(F, cx, V0, w):
            lv0 = mg_static.levels[0]
            return mg_mod.level_multiply(lv0, F, cx, V0, dt, w)

        w0 = jnp2.zeros((mg_static.levels[0].grid_m.shape[0], dim),
                        state.F.dtype)
        report("l0_one_apply",
               jax.jit(l0_one_apply).lower(state.F, ctx, state.V0, w0))
        print(json.dumps({
            "probe": "caps",
            "p_bins": list(lvl.comp.p_bins.p_cell.shape),
            "n_bins": list(lvl.comp.n_bins.p_cell.shape),
            "n_rows": int(lvl.mat_sym.n_rows), "K": int(lvl.mat_sym.K),
            "comp_w": list(lvl.comp.comp_w.shape),
            "node_rows": int(lvl.comp.node_coords.shape[0]),
        }), flush=True)


if __name__ == "__main__":
    main()
