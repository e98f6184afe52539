"""Radiance aggregation iterations over the path graph.

Port of the CUDA iteration drivers (SURVEY.md §2.9):

KNN mode — computeMISAllOnGPURecord (pbsdf.cu:2922-2968):
  pdfsum[i, s]   = sum_j pdf(sp_{nb[i,j]}, wi_{nb[i,s]}) * rrpdf_j
  temp^0         = eLi
  rad^{t}[i]     = sum_s [nb[i,s] alive] f(sp_i, wi_{nb[i,s]})
                   * temp^{t}[nb[i,s]+1] / pdfsum[i, s]     (gather form
                   of allGPUMISRadiance, pbsdf.cu:1346-1370)
  temp^{t+1}     = rad^{t} + eLd                            (updateRadiance)
  mc^{t}[i]      = f(sp_i, wi_i) * temp^{t+1}[i+1]
                   / (pdf(sp_i, wi_i) * rrpdf_i)            (lastRun,
                   pbsdf.cu:1497-1526)

Cluster mode — ClusterScatterWithDirectOptNR (shadingPoint.h:600-620):
  direct[j]      = sum_{i in cluster(j)} [ f(sp_j, wi_d_i) * Ld_i / mx_i
                   + f(sp_j, wi_i) * Lb_i / my_i ] + L_em_j
  marginal_i     = sum_{j in cluster(i), nidx_j != i}
                   pdf(sp_j, wi_i) * rrpdf_j
  rad^{t}[j]     = sum_{i in cluster(j), j != i+1}
                   f(sp_j, wi_i) * temp^{t}[i+1] / marginal_i
  temp^{t+1}     = rad^{t} + direct                (updateWithOptDirect)
  final mc       = lastRun on temp

The scatter-with-atomicAdd deposits become per-point GATHERS here: the
cluster neighborhood is symmetric (all pairs within a cluster), so each
point sums over its cluster's members directly — dense masked math over
a (n_clusters, pad) member table instead of serialized TPU scatters.
The reference's per-cluster energy-ratio rescale (clampCluster/
computeRatio/updateComputeCluster, pbsdf.cu:2127-2183) IS applied each
iteration (see energy_ratio below): clusters whose aggregated output
exceeds the radiance they received are rescaled per channel.  This is
a biased stabilization clamp (it only ever shrinks over-energetic
clusters), matching the reference's `opt` driver behavior.

Everything is float32 jnp, chunked over points to bound memory.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from nori_tpu.pathgraph.bsdfgraph import (
    GraphPoints, eval_graph_bsdf, pdf_graph_bsdf,
)

EPS_RR = 1e-7


def _next_gather(arr, idx_plus_1, n):
    return arr[jnp.minimum(idx_plus_1, n - 1)]




# ---------------------------------------------------------------------------
# Module-level jitted kernels (GraphPoints is a pytree, so these compile
# once per SHAPE and the cache survives across runs/datasets)
# ---------------------------------------------------------------------------

@jax.jit
def _pdf_sums_knn_block(gp, nb_c):
    sp_k = gp.gather(nb_c)                   # ONE gather of (m, k)
    spo = sp_k.expand(1)                     # (m, 1, k, ...)
    wi_b = sp_k.wi[:, :, None, :]            # (m, k, 1, 3)
    pdf = pdf_graph_bsdf(spo, wi_b)          # (m, k, k)
    rr = sp_k.rrpdf[:, None, :]
    sums = jnp.sum(pdf * rr, axis=2)
    alive = (sp_k.nidx > 0) & (sp_k.rrpdf > EPS_RR)
    return jnp.where(alive, sums, 0.0)


@jax.jit
def _mis_block(gp, temp_j, self_idx, nb_c, ps_c):
    n = temp_j.shape[0]
    sp_self = gp.gather(self_idx).expand(1)
    nb_k = gp.gather(nb_c)
    f = eval_graph_bsdf(sp_self, nb_k.wi)    # (m, k, 3)
    alive = (nb_k.nidx > 0) & (nb_k.rrpdf > EPS_RR) & (ps_c > 0.0)
    t_next = _next_gather(temp_j, nb_c + 1, n)
    contrib = f * t_next / jnp.maximum(ps_c, 1e-20)[..., None]
    contrib = jnp.where(alive[..., None], contrib, 0.0)
    return jnp.sum(contrib, axis=1)


@jax.jit
def _last_run_block(gp, temp_j, idx):
    n = temp_j.shape[0]
    sp = gp.gather(idx)
    spdf = pdf_graph_bsdf(sp, sp.wi)
    f = eval_graph_bsdf(sp, sp.wi)
    t_next = _next_gather(temp_j, idx + 1, n)
    inv = 1.0 / jnp.maximum(spdf * sp.rrpdf, 1e-20)
    rad = f * t_next * inv[..., None]
    ok = (spdf > 0.0) & (sp.nidx > 0)
    return jnp.where(ok[..., None], rad, 0.0)


@jax.jit
def _marginal_block(gp, mem_c, siz_c):
    pad = mem_c.shape[1]
    sp_k = gp.gather(mem_c)
    spo = sp_k.expand(1)                       # cols j
    wi_b = sp_k.wi[:, :, None, :]              # rows i
    pdf = pdf_graph_bsdf(spo, wi_b)            # (m, pad_i, pad_j)
    rr = sp_k.rrpdf[:, None, :]
    excl = sp_k.nidx[:, None, :] == mem_c[:, :, None]
    lane = jnp.arange(pad)
    valid_j = (lane[None, None, :] < siz_c[:, None, None])
    w = jnp.where(valid_j & ~excl, pdf * rr, 0.0)
    return jnp.sum(w, axis=2)


@jax.jit
def _direct_block(gp, ld, lb, lightpdf, mem_c, siz_c):
    pad = mem_c.shape[1]
    lane = jnp.arange(pad)
    valid = lane[None, :] < siz_c[:, None]
    sp_k = gp.gather(mem_c)
    spo = sp_k.expand(1)
    wi_b = sp_k.wi[:, :, None, :]
    pdf_b = pdf_graph_bsdf(spo, wi_b)
    valid_j = valid[:, None, :]
    lightpdf_k = lightpdf[mem_c]
    mx = jnp.sum(jnp.where(valid_j, lightpdf_k[:, :, None], 0.0), axis=2)
    my = jnp.sum(jnp.where(valid_j, pdf_b, 0.0), axis=2)

    sp_j = sp_k.expand(2)
    wid_i = sp_k.wi_d[:, None, :, :]
    wi_i = sp_k.wi[:, None, :, :]
    f_d = eval_graph_bsdf(sp_j, wid_i)         # (m, j, i, 3)
    f_b = eval_graph_bsdf(sp_j, wi_i)
    ld_i = ld[mem_c][:, None, :, :]
    lb_i = lb[mem_c][:, None, :, :]
    mx_i = mx[:, None, :, None]
    my_i = my[:, None, :, None]
    contrib = (
        jnp.where(mx_i > 0.0, f_d * ld_i / jnp.maximum(mx_i, 1e-20), 0.0)
        + jnp.where(my_i > 0.0, f_b * lb_i / jnp.maximum(my_i, 1e-20), 0.0)
    )
    valid_i = valid[:, None, :, None]
    contrib = jnp.where(valid_i, contrib, 0.0)
    return jnp.sum(contrib, axis=2)


@jax.jit
def _mx_block(gp, temp_j, marginal, mem_c, siz_c):
    n = temp_j.shape[0]
    pad = mem_c.shape[1]
    lane = jnp.arange(pad)
    valid = lane[None, :] < siz_c[:, None]
    sp_k = gp.gather(mem_c)
    sp_j = sp_k.expand(2)
    wi_i = sp_k.wi[:, None, :, :]
    f = eval_graph_bsdf(sp_j, wi_i)            # (m, j, i, 3)
    t_next = _next_gather(temp_j, mem_c + 1, n)
    marg_i = marginal[mem_c]
    alive_i = (sp_k.nidx > 0) & (marg_i > 0.0) & (sp_k.rrpdf > EPS_RR)
    w = t_next / jnp.maximum(marg_i, 1e-20)[..., None]
    w = jnp.where(alive_i[..., None], w, 0.0)
    self_next = mem_c[:, :, None] == (mem_c[:, None, :] + 1)
    contrib = f * w[:, None, :, :]
    contrib = jnp.where(self_next[..., None], 0.0, contrib)
    contrib = jnp.where(valid[:, None, :, None], contrib, 0.0)
    return jnp.sum(contrib, axis=2)


# ---------------------------------------------------------------------------
# KNN mode
# ---------------------------------------------------------------------------

def pdf_sums_knn(gp: GraphPoints, neighbors, chunk: int = 16384):
    """(N, k) pdf sums (allGPUPdfSum, pbsdf.cu:1600-1618)."""
    n, k = neighbors.shape
    nb = jnp.asarray(neighbors)
    out = np.zeros((n, k), np.float32)
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        out[c0:c1] = np.asarray(_pdf_sums_knn_block(gp, nb[c0:c1]))
    return out


def iterate_knn(gp: GraphPoints, neighbors, iterations: int,
                chunk: int = 65536):
    """computeMISAllOnGPURecord: returns (blur_results, mc_results) —
    lists of (N, 3) numpy arrays, one per iteration."""
    n, k = neighbors.shape
    nb = jnp.asarray(neighbors)
    pdfsum = jnp.asarray(pdf_sums_knn(gp, neighbors))

    def mis_pass(temp):
        rad = np.zeros((n, 3), np.float32)
        temp_j = jnp.asarray(temp)
        for c0 in range(0, n, chunk):
            c1 = min(c0 + chunk, n)
            self_idx = jnp.arange(c0, c1, dtype=jnp.int32)
            rad[c0:c1] = np.asarray(_mis_block(
                gp, temp_j, self_idx, nb[c0:c1], pdfsum[c0:c1]))
        return np.nan_to_num(rad, nan=0.0, posinf=0.0, neginf=0.0)

    eLi = np.asarray(gp.eLi)
    eLd = np.asarray(gp.eLd)
    temp = eLi.copy()
    blur_results, mc_results = [], []
    for it in range(iterations):
        rad = mis_pass(temp)
        blur_results.append(rad)
        temp = rad + eLd
        mc_results.append(last_run(gp, temp, chunk=chunk))
    return blur_results, mc_results


def last_run(gp: GraphPoints, temp, chunk: int = 262144):
    """Final MC conversion through the point's own BSDF/pdf
    (lastRun, pbsdf.cu:1497-1526)."""
    n = int(np.asarray(gp.nidx).shape[0])
    temp_j = jnp.asarray(temp)
    out = np.zeros((n, 3), np.float32)
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        idx = jnp.arange(c0, c1, dtype=jnp.int32)
        out[c0:c1] = np.asarray(_last_run_block(gp, temp_j, idx))
    return np.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


# ---------------------------------------------------------------------------
# Cluster mode
# ---------------------------------------------------------------------------

def _cluster_tables(members, sizes):
    """jnp mirrors of the padded member table."""
    return jnp.asarray(members), jnp.asarray(sizes)


def marginal_cluster(gp: GraphPoints, members, sizes, cluster_id,
                     chunk: int = 2048):
    """Per-point marginal (allGPUClusterPdfMarginal, pbsdf.cu:1239)."""
    n = int(np.asarray(gp.nidx).shape[0])
    c, pad = members.shape
    mem_j, siz_j = _cluster_tables(members, sizes)

    out = np.zeros(n, np.float32)
    _block = lambda mem_c, siz_c: _marginal_block(gp, mem_c, siz_c)

    for b0 in range(0, c, chunk):
        b1 = min(b0 + chunk, c)
        vals = np.asarray(_block(mem_j[b0:b1], siz_j[b0:b1]))
        mm = members[b0:b1]
        mask = np.arange(pad)[None, :] < sizes[b0:b1][:, None]
        out[mm[mask]] = vals[mask]
    return out


def direct_cluster(gp: GraphPoints, lps, members, sizes,
                   chunk: int = 2048, include_emitter: bool = True):
    """ClusterDirect (pbsdf.cu:2400-2430): direct-light MIS
    re-aggregation (+ addEmitterToDirectLight when include_emitter).

    NOTE: the iteration uses the WITHOUT-emitter variant as the temp
    source — our dumps deliver next-vertex emission through the MIS
    em-hit half of L_bsdfsample, so adding L_em into temp as well would
    double-count it (deviation from the literal kernel order, which
    assumes the external pathrenderer's eLd/eLi conventions)."""
    n = int(np.asarray(gp.nidx).shape[0])
    c, pad = members.shape
    mem_j, siz_j = _cluster_tables(members, sizes)
    ld = jnp.asarray(np.asarray(lps["L_directsample"]), jnp.float32)
    lb = jnp.asarray(np.asarray(lps["L_bsdfsample"]), jnp.float32)
    lem = jnp.asarray(np.asarray(lps["L_em"]), jnp.float32)
    lightpdf = jnp.asarray(np.asarray(lps["lightpdf"]), jnp.float32)

    _block = lambda mem_c, siz_c: _direct_block(
        gp, ld, lb, lightpdf, mem_c, siz_c)

    out = np.zeros((n, 3), np.float32)
    for b0 in range(0, c, chunk):
        b1 = min(b0 + chunk, c)
        vals = np.asarray(_block(mem_j[b0:b1], siz_j[b0:b1]))
        mm = members[b0:b1]
        mask = np.arange(pad)[None, :] < sizes[b0:b1][:, None]
        out[mm[mask]] = vals[mask]
    if include_emitter:
        out += np.asarray(lem)
    return np.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


def iterate_cluster(gp: GraphPoints, lps, members, sizes, cluster_id,
                    iterations: int, chunk: int = 2048):
    """ClusterScatterWithDirectOptNR: returns
    (blur_results, mc_results, direct) matching ResultSpace."""
    n = int(np.asarray(gp.nidx).shape[0])
    direct = direct_cluster(gp, lps, members, sizes, chunk=chunk,
                            include_emitter=False)
    marginal = jnp.asarray(
        marginal_cluster(gp, members, sizes, cluster_id, chunk=chunk))
    mem_j, siz_j = _cluster_tables(members, sizes)
    c, pad = members.shape

    def mx_pass(temp):
        temp_j = jnp.asarray(temp)
        _block = lambda mem_c, siz_c: _mx_block(
            gp, temp_j, marginal, mem_c, siz_c)

        rad = np.zeros((n, 3), np.float32)
        for b0 in range(0, c, chunk):
            b1 = min(b0 + chunk, c)
            vals = np.asarray(_block(mem_j[b0:b1], siz_j[b0:b1]))
            mm = members[b0:b1]
            mask = np.arange(pad)[None, :] < sizes[b0:b1][:, None]
            rad[mm[mask]] = vals[mask]
        return np.nan_to_num(rad, nan=0.0, posinf=0.0, neginf=0.0)

    def energy_ratio(rad, temp):
        """Per-cluster energy clamp (clampCluster/computeRatio/
        updateComputeCluster, pbsdf.cu:2127-2183): if a cluster emits
        more than it received, rescale its output per channel."""
        ncl = len(np.unique(cluster_id))
        nidx = np.asarray(gp.nidx)
        cid = np.asarray(cluster_id)
        inn = np.zeros((ncl, 3), np.float64)
        outn = np.zeros((ncl, 3), np.float64)
        feeding = nidx > 0
        nxt = np.minimum(np.arange(n) + 1, n - 1)
        np.add.at(inn, cid[feeding], temp[nxt[feeding]])
        np.add.at(outn, cid, rad)
        ratio = np.where(inn < outn, inn / np.maximum(outn, 1e-20), 1.0)
        return (rad * ratio[cid]).astype(np.float32)

    eLi = np.asarray(gp.eLi)
    temp = eLi.copy()
    blur_results, mc_results = [], []
    rad = None
    for it in range(iterations):
        rad = mx_pass(temp)
        rad = energy_ratio(rad, temp)
        blur_results.append(rad)
        temp = rad + direct
        mc_results.append(last_run(gp, temp))
    # display variant includes each vertex's own emission
    direct_disp = direct + np.asarray(
        np.asarray(lps["L_em"], np.float32))
    return blur_results, mc_results, direct_disp
