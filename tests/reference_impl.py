"""Slow, independent numpy implementations of the core quantities, used to
cross-validate the vectorized JAX ops.  Deliberately written with a
different algorithm (explicit per-edge walks + per-pop sweep line) than the
tensorized pairwise-overlap formulation."""

from __future__ import annotations

import numpy as np

OLDAGE = 999.0


def edge_pieces(father, age, node_pop, mig_branch, mig_band, mig_age,
                band_source, tau, pop_father, num_pops):
    """Return list of (t0, t1, pop) pieces: each lineage piece within one pop
    window.  Walks every edge upward through its migration events and splits
    at population-window boundaries."""
    N = len(father)
    pieces = []
    for v in range(N):
        lo = age[v]
        hi = age[father[v]] if father[v] >= 0 else OLDAGE
        # migs on this edge sorted by age
        migs = sorted(
            [(mig_age[m], mig_band[m]) for m in range(len(mig_branch))
             if mig_branch[m] == v],
        )
        cur_pop = node_pop[v]
        cur_t = lo
        for (mt, mb) in migs:
            pieces += _split_by_pop_windows(cur_t, mt, cur_pop, tau,
                                            pop_father)
            cur_pop = band_source[mb]
            cur_t = mt
        pieces += _split_by_pop_windows(cur_t, hi, cur_pop, tau, pop_father)
    return pieces


def _split_by_pop_windows(t0, t1, base_pop, tau, pop_father):
    """Split [t0, t1] starting in base_pop into (t0', t1', pop) pieces
    following the ancestor chain of base_pop."""
    out = []
    p = base_pop
    t = t0
    while t < t1:
        top = tau[pop_father[p]] if pop_father[p] >= 0 else OLDAGE
        hi = min(t1, top)
        if hi > t:
            out.append((t, hi, p))
        if pop_father[p] < 0:
            break
        t = max(t, hi)
        if t1 <= top:
            break
        p = pop_father[p]
    return out


def stats_reference(father, age, node_pop, mig_branch, mig_band, mig_age,
                    band_source, band_target, band_start, band_end,
                    tau, pop_father, num_pops):
    """Sweep-line computation of coal/mig sufficient statistics."""
    pieces = edge_pieces(father, age, node_pop, mig_branch, mig_band,
                         mig_age, band_source, tau, pop_father, num_pops)
    coal = np.zeros(num_pops)
    nbands = len(band_source)
    mig = np.zeros(nbands)
    for p in range(num_pops):
        evts = []
        for (a, b, q) in pieces:
            if q == p and b > a:
                evts.append((a, +1))
                evts.append((b, -1))
        evts.sort()
        n = 0
        prev = None
        for (t, d) in evts:
            if prev is not None and t > prev:
                coal[p] += n * (n - 1) * (t - prev)
                for bd in range(nbands):
                    if band_target[bd] == p:
                        lo = max(prev, band_start[bd])
                        hi = min(t, band_end[bd])
                        if hi > lo:
                            mig[bd] += n * (hi - lo)
            n += d
            prev = t
    S = (len(father) + 1) // 2
    ncoal = np.zeros(num_pops, int)
    for v in range(S, len(father)):
        ncoal[node_pop[v]] += 1
    nmig = np.zeros(nbands, int)
    for m in range(len(mig_branch)):
        if mig_branch[m] >= 0:
            nmig[mig_band[m]] += 1
    return coal, mig, ncoal, nmig


def pruning_reference(father, lson, rson, age, root, mut_rate,
                      leaf_base, group_id, group_count, group_nphases,
                      pattern_valid):
    """Recursive Felsenstein pruning under JC (one locus)."""
    N = len(father)
    S = (N + 1) // 2
    P = leaf_base.shape[1]
    cond = np.zeros((N, P, 4))
    for s in range(S):
        for p in range(P):
            b = leaf_base[s, p]
            if b >= 4:
                cond[s, p, :] = 1.0
            else:
                cond[s, p, b] = 1.0

    def visit(v):
        if v < S:
            return
        for son in (lson[v], rson[v]):
            visit(son)
        out = np.ones((P, 4))
        for son in (lson[v], rson[v]):
            ln = mut_rate * (age[v] - age[son])
            p_sub = 0.0 if ln < 1e-100 else (1 - np.exp(-4 * ln / 3)) / 4
            c = cond[son]
            out = out * (p_sub * c.sum(-1, keepdims=True) + (1 - 4 * p_sub) * c)
        cond[v] = out

    visit(root)
    rs = cond[root].sum(-1) * pattern_valid
    lnl = 0.0
    for g in range(P):
        tot = rs[group_id == g].sum()
        if group_count[g] > 0:
            lnl += group_count[g] * np.log(tot / (4.0 * group_nphases[g]))
    return lnl
