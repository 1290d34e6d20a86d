"""Round-3e: bf16-native lean-kernel variant (all dots on bf16 operands,
minimal VPU casts) + block_b/block_sub sweep. Run on the real TPU."""

import functools
import json
import sys
import time

import numpy as np


def t(f, *args, iters=30, warmup=2):
    import jax

    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, "/root/repo")
    from bench import powerlaw_graph
    from mma_tpu.constants import BLOCK_R
    from mma_tpu.ops.pallas import fused_mma as fm

    res = {"device": str(jax.devices()[0])}
    rs = np.random.RandomState(0)
    n_feat, k = 64, 2
    graph = powerlaw_graph(131072, avg_deg=16, seed=1)
    n, e = graph.n_node, graph.n_edge
    n_real = int(np.asarray(graph.num_edges))
    ckf = k * n_feat
    h = jnp.asarray(rs.randn(n, n_feat).astype(np.float32))
    c = jnp.asarray(rs.randn(n, ckf).astype(np.float32))
    w_bot = jnp.asarray(rs.randn(n_feat, ckf).astype(np.float32))

    F32 = jnp.float32
    BF = jnp.bfloat16

    def make_kernel(native, block_b, block_sub):
        def dot16(a16, b16, dims=(((1,), (0,)), ((), ()))):
            return jax.lax.dot_general(
                a16, b16, dims, preferred_element_type=F32,
                precision=jax.lax.Precision.DEFAULT)

        def kern(bstep_ref, cstep_ref, starts_ref, ends_ref, ids_ref, hg_ref,
                 c_ref, w_ref, pat_ref, out_ref):
            i = pl.program_id(0)
            r = bstep_ref[i]
            cc = cstep_ref[i]
            start, end = starts_ref[r], ends_ref[r]
            num_chunks = pl.cdiv(end, block_b) - start // block_b

            @pl.when(cc == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            @pl.when((start < end) & (cc < num_chunks))
            def _():
                block_r = out_ref.shape[0]
                ckf_ = out_ref.shape[1]
                g = start // block_b + cc
                row0 = r * block_r
                rr = jax.lax.broadcasted_iota(jnp.int32, (block_r, block_sub), 0)
                sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_sub), 1)
                acc = jnp.zeros_like(out_ref)
                if native:
                    c16 = c_ref[:]  # bf16 inputs
                    w16 = w_ref[:]
                else:
                    c_terms = fm._split_terms(c_ref[:], 1)
                    w_terms = fm._split_terms(w_ref[:], 1)
                for j in range(block_b // block_sub):
                    gidx = g * block_b + j * block_sub + sub_iota
                    covered = (gidx >= start) & (gidx < end)
                    ids = ids_ref[0, j : j + 1, :]
                    onehot = ((ids - row0) == rr) & covered
                    hg = hg_ref[pl.ds(j * block_sub, block_sub), :]
                    if native:
                        oh16 = onehot.astype(BF)
                        logits = (dot16(oh16, c16, (((0,), (0,)), ((), ())))
                                  + dot16(hg[:, :n_feat], w16))
                        mask16 = jax.nn.sigmoid(logits).astype(BF)
                        prod16 = mask16 * hg[:, :ckf_]
                        acc += dot16(oh16, prod16)
                    else:
                        h_t = hg[:, :ckf_].astype(F32)
                        logits = (fm._select_rows_pre(onehot, c_terms)
                                  + fm._dot_split_pre(hg[:, :n_feat], w_terms, 1))
                        mask = jax.nn.sigmoid(logits)
                        acc = fm._contract(acc, onehot, mask * h_t, 1)
                out_ref[:] += acc
        return kern

    def run_variant(native, block_b, block_sub):
        tab = jnp.tile(h, (1, k)).astype(BF)
        hg = tab[graph.src]
        (hg_p,), dst = fm._pad_edges([hg], graph.dst, e, n, block_b)
        e_pad, f_pad = hg_p.shape
        (nn, num_blocks, num_chunks, total_steps, starts, ends, block_of,
         chunk_of) = fm._grid_and_prefetch(graph.row_ptr, e_pad, BLOCK_R, block_b)
        chunk_index = fm._chunk_index_fn(num_chunks, block_b)
        n_sub = block_b // block_sub
        n_rows = int(num_blocks) * BLOCK_R
        cdt = BF if native else F32
        c_p = jnp.pad(c, ((0, n_rows - n), (0, 0))).astype(cdt)
        w_in = w_bot.astype(cdt)
        pat2 = jnp.ones((1, ckf), F32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(total_steps,),
            in_specs=[
                pl.BlockSpec((1, n_sub, block_sub),
                             lambda i, b, c_, s, e_: (chunk_index(i, b, c_, s, e_), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, f_pad),
                             lambda i, b, c_, s, e_: (chunk_index(i, b, c_, s, e_), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_R, ckf), lambda i, b, c_, s, e_: (b[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_feat, ckf), lambda i, b, c_, s, e_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ckf), lambda i, b, c_, s, e_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK_R, ckf),
                                   lambda i, b, c_, s, e_: (b[i], 0),
                                   memory_space=pltpu.VMEM),
        )
        fn = pl.pallas_call(
            make_kernel(native, block_b, block_sub),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, ckf), F32),
        )
        g = jax.jit(lambda *a: fn(*a))
        args = (block_of, chunk_of, starts, ends,
                dst.reshape(num_chunks, n_sub, block_sub), hg_p, c_p,
                w_in, pat2)
        return t(g, *args), g(*args)

    base_out = None
    for native in (False, True):
        for block_b in (1024, 2048):
            for block_sub in (128, 256):
                key = f"lean_nat{int(native)}_b{block_b}_sub{block_sub}"
                try:
                    dt_s, out = run_variant(native, block_b, block_sub)
                    res[key + "_ms"] = dt_s * 1e3
                    res[key + "_Medges_s"] = n_real / dt_s / 1e6
                    if base_out is None:
                        base_out = np.asarray(out)
                    else:
                        res[key + "_maxdiff"] = float(
                            np.abs(np.asarray(out) - base_out).max())
                except Exception as ex:
                    res[key + "_err"] = f"{type(ex).__name__}: {str(ex)[:160]}"
                print(key, res.get(key + "_ms"), file=sys.stderr, flush=True)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
