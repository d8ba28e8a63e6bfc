"""State invariant checker — the analogue of the reference's checkAll()
(src/patch.c:2745-2884, checkGtreeStructure :2978-3542).

The reference needs checkAll because its incremental bookkeeping (event
chains, delta stats, saved versions) can drift from the authoritative
state.  Here the only carried quantities are lnld/lnp; everything else is
recomputed functionally.  The checker still validates the structural
invariants of the genealogy/migration tensors after updates, and verifies
the carried likelihoods against fresh recomputation.
"""

from __future__ import annotations

from typing import List

import numpy as np

from gphocs_tpu.constants import OLDAGE
from gphocs_tpu.model.poptree import PopTree, band_times


def check_gen_state(gen, params, tree: PopTree, atol=1e-9) -> List[str]:
    """Returns a list of violation messages (empty if consistent)."""
    errs: List[str] = []
    fa = np.asarray(gen.father)
    ls = np.asarray(gen.lson)
    rs = np.asarray(gen.rson)
    age = np.asarray(gen.age)
    npop = np.asarray(gen.node_pop)
    root = np.asarray(gen.root)
    mbr = np.asarray(gen.mig_branch)
    mbd = np.asarray(gen.mig_band)
    mag = np.asarray(gen.mig_age)
    tau = np.asarray(params.tau)
    sage = np.asarray(params.sample_age)
    L, N = fa.shape
    S = (N + 1) // 2
    anc = tree.is_ancestral
    pop_end = np.where(tree.father >= 0, tau[tree.father], OLDAGE)
    bstart, bend = band_times(tree, tau)

    for l in range(L):
        roots = [v for v in range(N) if fa[l, v] < 0]
        if roots != [root[l]]:
            errs.append(f"locus {l}: root mismatch {roots} vs {root[l]}")
            continue
        for v in range(S, N):
            for son in (ls[l, v], rs[l, v]):
                if son < 0 or fa[l, son] != v:
                    errs.append(f"locus {l}: node {v} son {son} father "
                                f"link broken")
                elif age[l, son] > age[l, v] + atol:
                    errs.append(f"locus {l}: node {v} younger than son {son}")
            p = npop[l, v]
            if not (tau[p] - atol <= age[l, v] <= pop_end[p] + atol):
                errs.append(f"locus {l}: node {v} age {age[l, v]} outside "
                            f"pop {p} window [{tau[p]}, {pop_end[p]}]")
        for v in range(S):
            if ls[l, v] >= 0 or rs[l, v] >= 0:
                errs.append(f"locus {l}: leaf {v} has sons")
            expected = sage[npop[l, v]]
            if abs(age[l, v] - expected) > atol:
                errs.append(f"locus {l}: leaf {v} age {age[l, v]} != "
                            f"sample age {expected}")

        # migration events: on live edges, inside band windows, ordered
        # trajectories consistent with node pops
        for m in range(mbr.shape[1]):
            if mbr[l, m] < 0:
                continue
            v, b, t = mbr[l, m], mbd[l, m], mag[l, m]
            top = age[l, fa[l, v]] if fa[l, v] >= 0 else OLDAGE
            if not (age[l, v] - atol <= t <= top + atol):
                errs.append(f"locus {l}: mig {m} age {t} outside edge {v} "
                            f"[{age[l, v]}, {top}]")
            if not (bstart[b] - atol <= t <= bend[b] + atol):
                errs.append(f"locus {l}: mig {m} age {t} outside band {b} "
                            f"window [{bstart[b]}, {bend[b]}]")
        # per-edge trajectory check
        for v in range(N):
            migs = sorted((mag[l, m], mbd[l, m])
                          for m in range(mbr.shape[1]) if mbr[l, m] == v)
            cur = npop[l, v]
            for (t, b) in migs:
                tgt = tree.band_target[b]
                src = tree.band_source[b]
                if not anc[tgt, cur]:
                    errs.append(f"locus {l}: mig on edge {v} band {b} at {t}:"
                                f" lineage pop {cur} not under target {tgt}")
                if not (tau[tgt] - atol <= t <= pop_end[tgt] + atol):
                    errs.append(f"locus {l}: mig at {t} outside target pop "
                                f"{tgt} window")
                cur = src
            if fa[l, v] >= 0:
                fpop = npop[l, fa[l, v]]
                if not anc[fpop, cur]:
                    errs.append(f"locus {l}: edge {v} trajectory ends in pop "
                                f"{cur}, father pop {fpop} not ancestral")
    return errs


def check_likelihoods(sampler, atol=1e-8) -> List[str]:
    """Verify the carried lnld/lnp against fresh recomputation
    (analogue of checkLocusDataLikelihood, src/LocusDataLikelihood.c:717)."""
    from gphocs_tpu.kernels.common import gen_log_prior
    from gphocs_tpu.ops.pruning import data_log_likelihood

    errs = []
    lnld = np.asarray(data_log_likelihood(sampler.gen, sampler.seq))
    lnp = np.asarray(gen_log_prior(sampler.gen, sampler.params, sampler.ctx))
    dl = np.abs(lnld - np.asarray(sampler.lnld)).max()
    dp = np.abs(lnp - np.asarray(sampler.lnp)).max()
    if dl > atol:
        errs.append(f"carried data lnL drift {dl}")
    if dp > atol:
        errs.append(f"carried genealogy prior drift {dp}")
    return errs
