"""Single-step the first SPR sweep (f32, XLA path) from the initial golden
state, checking invariants after every node step, and dump the walk
internals of the first corrupting (locus, node)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from diag_runner import ensure_data, SEQ, BURNIN  # noqa: E402
from golden_compare import CTL_TEMPLATE  # noqa: E402
from gphocs_tpu.config import parse_control_text  # noqa: E402
from gphocs_tpu.debugcheck import check_gen_state  # noqa: E402
from gphocs_tpu.sampler.driver import Sampler  # noqa: E402
from gphocs_tpu.kernels.spr import _simulate_reconnect, _apply_spr  # noqa
from gphocs_tpu.kernels.common import mh_accept  # noqa: E402
from gphocs_tpu.ops.likelihood_cache import refresh_and_lnld  # noqa: E402


def main():
    ensure_data()
    ctl = CTL_TEMPLATE.format(seq=SEQ, trace="t.out", iters=8000,
                              burnin=BURNIN, seed=1357)
    cfg = parse_control_text(ctl)
    cfg.mcmc.random_seed = 4242
    s = Sampler(cfg, seq_path=SEQ, dtype=jnp.float32, rng_mode="fast")
    s.initialize()
    s._sample_mig_rates_device()
    gen, rng_state, lnld, cond = s.gen, s.lrng, s.lnld, s.cond
    params, ctx = s.params, s.ctx
    L, N = gen.father.shape
    # replay the iteration-1 stream position: the mig-age sweep before SPR
    # consumes 4 draws per slot regardless of activity
    rng_state = rng_state._replace(
        ctr=rng_state.ctr + jnp.uint32(4 * gen.max_migs))
    ar = jnp.arange(L)

    for inode in range(N):
        node = jnp.full((L,), inode, jnp.int32)
        not_root = gen.root != inode
        rng_before = rng_state
        sim = _simulate_reconnect(gen, params, ctx, node, rng_state,
                                  not_root)
        rng_state = sim.rng
        ok = sim.status == 1
        gen_prop = _apply_spr(gen, ctx, node, ok, sim)
        f = gen.father[ar, node]
        g = gen.father[ar, jnp.where(f < 0, 0, f)]
        tgt_fa = gen.father[ar, sim.target]
        nid = jnp.arange(N, dtype=jnp.int32)[None, :]
        dirty0 = ((nid == f[:, None]) & (f >= 0)[:, None]) \
            | ((nid == g[:, None]) & (g >= 0)[:, None]) \
            | ((nid == tgt_fa[:, None]) & (tgt_fa >= 0)[:, None]
               & ok[:, None])
        cond_prop, lnld_prop = refresh_and_lnld(cond, gen_prop, s.seq,
                                                dirty0)
        lnacc = lnld_prop - lnld
        accept, rng_state = mh_accept(rng_state, lnacc, ok)
        gen_new = jax.tree_util.tree_map(
            lambda n_, o: jnp.where(
                accept.reshape((L,) + (1,) * (o.ndim - 1)), n_, o)
            if o.ndim >= 1 and o.shape[0] == L else jnp.where(accept, n_, o),
            gen_prop, gen)
        cond = jnp.where(accept[:, None, None, None], cond_prop, cond)
        lnld = jnp.where(accept, lnld_prop, lnld)

        errs = check_gen_state(gen_new, params, s.tree, atol=1e-5)
        if errs:
            print(f"CORRUPTION after node step {inode}:")
            for e in errs[:5]:
                print("   ", e)
            bad = int(errs[0].split()[1].rstrip(":"))
            l = bad
            print(f"lane {l}: accept={bool(accept[l])} ok={bool(ok[l])} "
                  f"status={int(sim.status[l])}")
            print(f"  pruned node={inode} f={int(f[l])} "
                  f"sib={int(gen.lson[l, f[l]] + gen.rson[l, f[l]] - inode)}"
                  f" g={int(g[l])}")
            print(f"  sim.pop={int(sim.pop[l])} "
                  f"coal_age={float(sim.coal_age[l]):.8g} "
                  f"target={int(sim.target[l])} n_new={int(sim.n_new[l])}")
            print(f"  tau={np.asarray(params.tau)}")
            print(f"  PRE age[l]={np.asarray(gen.age[l])}")
            print(f"  PRE pop[l]={np.asarray(gen.node_pop[l])}")
            print(f"  PRE father[l]={np.asarray(gen.father[l])}")
            print(f"  POST age[l]={np.asarray(gen_new.age[l])}")
            print(f"  POST pop[l]={np.asarray(gen_new.node_pop[l])}")
            print(f"  POST father[l]={np.asarray(gen_new.father[l])}")
            print(f"  start_age={float(gen.age[l, inode]):.8g} "
                  f"start_pop={int(gen.node_pop[l, inode])}")
            walk_trace(gen, params, ctx, s.seq, inode, l, rng_before)
            return
        gen = gen_new
    print("sweep clean")


def walk_trace(gen, params, ctx, seq, inode, lane, rng_state):
    """Numpy replay of _simulate_reconnect trip 1 for one lane, printing
    the segment tables and inversion internals."""
    import numpy as np
    from gphocs_tpu.kernels.common import band_windows
    from gphocs_tpu import rng_fast as RF

    dtf = np.float32
    l = lane
    L, N = gen.father.shape
    M = gen.max_migs
    P = ctx.num_pops
    age = np.asarray(gen.age)[l].astype(dtf)
    fa = np.asarray(gen.father)[l]
    npp = np.asarray(gen.node_pop)[l]
    tau = np.asarray(params.tau).astype(dtf)
    theta = np.asarray(params.theta).astype(dtf)
    mig = np.asarray(params.mig_rate).astype(dtf)
    bs, be = band_windows(ctx, params.tau)
    bs, be = np.asarray(bs).astype(dtf), np.asarray(be).astype(dtf)
    anc = np.asarray(ctx.is_ancestral)
    fp = np.asarray(ctx.father_pop)
    from gphocs_tpu.constants import OLDAGE
    pe = np.where(fp < 0, OLDAGE, tau[np.where(fp < 0, 0, fp)]).astype(dtf)

    top = np.where(fa < 0, OLDAGE,
                   age[np.where(fa < 0, 0, fa)]).astype(dtf)
    start_age = age[inode]
    start_pop = npp[inode]
    bounds = np.concatenate([age, np.zeros(M, dtf), tau, bs, be,
                             [np.float32(OLDAGE)]])
    b_sorted = np.sort(bounds)
    lo_base = np.concatenate([[0.0], b_sorted[:-1]]).astype(dtf)
    mids = (0.5 * (lo_base + b_sorted)).astype(dtf)
    K = len(b_sorted)
    # lineage counts per segment (exclude pruned edge)
    n = np.zeros(K, dtf)
    onpath = anc[:, start_pop]
    for k in range(K):
        t = mids[k]
        pops_alive = [npp[v] for v in range(N)
                      if v != inode and age[v] <= t < top[v]]
        # pop of segment k along start_pop's path
        pk = -1
        for p in range(P):
            if onpath[p] and tau[p] <= t < pe[p]:
                pk = p
        if pk >= 0:
            n[k] = sum(1 for q in pops_alive if anc[pk, q])
    segpop = np.full(K, -1)
    for k in range(K):
        t = mids[k]
        for p in range(P):
            if onpath[p] and tau[p] <= t < pe[p]:
                segpop[k] = p
    rate = np.zeros(K, dtf)
    for k in range(K):
        if segpop[k] >= 0:
            mr = 0.0
            for b in range(len(bs)):
                if (bs[b] <= mids[k] < be[b]
                        and np.asarray(ctx.band_target)[b] == segpop[k]):
                    mr += mig[b]
            rate[k] = dtf(mr) + dtf(2.0) * n[k] / theta[segpop[k]]
    lo = np.maximum(lo_base, start_age).astype(dtf)
    hi = np.maximum(b_sorted, start_age).astype(dtf)
    seg_len = np.maximum(hi - lo, 0).astype(dtf)
    hz = (rate * seg_len).astype(dtf)
    cum = np.cumsum(hz, dtype=dtf).astype(dtf)
    key = np.asarray(rng_state.key)[l]
    ctr = int(rng_state.ctr)
    import jax.numpy as jnp
    u1 = float(RF._raw_u(RF.FastRngState(
        key=jnp.asarray([key]), ctr=jnp.uint32(ctr)), 1)[0])
    E = dtf(-np.log(max(u1, 1e-300)))
    reached = cum >= E
    k = int(np.argmax(reached))
    print(f"lane {l} node {inode}: start_age={start_age:.8g} "
          f"start_pop={start_pop} u1={u1:.8g} E={E:.8g}")
    print(f"  k={k} reached.any={reached.any()}")
    print(f"  b_sorted={b_sorted}")
    print(f"  segpop ={segpop}")
    print(f"  n      ={n}")
    print(f"  rate   ={rate}")
    print(f"  seg_len={seg_len}")
    print(f"  hz     ={hz}")
    print(f"  cum    ={cum}")
    kk = k
    prev_cum = dtf(cum[kk] - hz[kk])
    t_event = dtf(lo[kk] + (E - prev_cum) / max(rate[kk], 1e-30))
    print(f"  lo_k={lo[kk]:.8g} cum_k={cum[kk]:.8g} hz_k={hz[kk]:.8g} "
          f"prev_cum={prev_cum:.8g} rate_k={rate[kk]:.8g} "
          f"E-prev={E - prev_cum:.8g} t_event={t_event:.8g}")


if __name__ == "__main__":
    main()
