"""Fully-fused chain-blocked SGLD transition kernel (Pallas TPU).

ONE ``pallas_call`` advances a whole fleet of tensor-GP SGLD chains through an
ENTIRE transition: likelihood forward, hand-derived backward
(``computeU_phi``/``computeA``/``computePsi`` chain, ``GPT_SGLD.jl:245-286``),
Langevin noise (in-kernel TPU PRNG, Box–Muller), the Euclidean w update, the
Stiefel update (tangent projection + Newton–Schulz polar retraction,
``GPT_SGLD.jl:410-439``), and the divergence check — with every intermediate
resident in VMEM.

Why: the XLA-op-graph step at C=4096 chains costs ~17 ms while its cost-model
floor is ~0.3 ms — the gap is (a) tiny per-chain matmuls that cannot tile the
MXU, (b) a likelihood backward that materialises (C, m, D, Q) HBM tensors,
(c) dozens of small-op dispatches, and (d) threefry noise. This kernel removes
all four (measured in ``scripts/cliff_probe.py`` / SCALING_chains.md).

TPU-first design decisions:

- **Chains live on the matmul LANE axis, everywhere.** ``U`` is carried as
  ``(D, n, CB*r)`` per block (CB chains' factor columns concatenated), ``w``
  as ``(1, CB*Q)``, and every data intermediate as ``(mc, CB*r)`` or
  ``(mc, CB*Q)``. Mosaic cannot lower lane→sublane shape casts (e.g.
  ``(mc, CB*r) → (mc*CB, r)`` fails with "unsupported shape cast"), so the
  kernel NEVER moves data between the lane and sublane axes: the core-index
  gather becomes a matmul against a **block-diagonal one-hot matrix**
  ``(CB*r, CB*Q)`` (CB copies of the per-dim (r, Q) indicator), and all
  per-chain lane-group reductions (fhat, NaN counts, rejection masks) are
  matmuls against iota-built 0/1 chain-membership matrices. The block-diag
  matmuls spend CB× the minimal FLOPs, but they are single-pass bf16 MXU ops
  — orders of magnitude cheaper than the dispatch+relayout storm they
  replace (and ``chain_block`` tunes the trade-off).
- **Grid ``(chain_blocks, data_chunks)``** with gradient accumulators in VMEM
  scratch: the minibatch is swept in ``mc``-row chunks, so VMEM holds only
  ``(mc, CB*Q)`` product tensors (the (C, m, D, Q) HBM blow-up of the XLA
  backward never exists), and arbitrarily large batches stream.
- **Block-diagonal manifold algebra.** The per-chain r x r Gram/NS-iteration
  matmuls (the >256-chain cliff's root cause: C*D batched (10, 100)@(100, 10)
  einsums at HIGHEST precision) become per-block ``(CB*r, CB*r)`` matmuls
  masked to their block diagonal — CB chains' manifold algebra per MXU pass.
- **Divergence check fused into the retraction.** The Newton–Schulz iteration
  already computes X^T X; its first residual ``max |X^T X - I|`` IS the
  divergence signal (healthy steps: ~eps_U * ||mom||^2 ~ 1e-5; diverged
  gradients: >> 1; NaN -> rejected), so the separate HIGHEST-precision
  orthogonality-check einsum of the XLA path disappears.
- **In-kernel noise.** ``pltpu.prng_random_bits`` + Box–Muller replaces
  threefry2x32 (measured ~1 ms per step at C=256 for the (C, D, n, r) normal
  draw — comparable to the entire rest of the step).
- bf16 1-pass MXU for the likelihood path AND the tangent projection (both
  perturb an already-stochastic gradient; the XLA path's DEFAULT-precision
  einsums are the same class); f32 HIGHEST only where precision is
  load-bearing: the Newton–Schulz correction (must resolve ~1e-5 Gram
  residuals — measured long-run orthonormality 6e-7 over 500 steps) and the
  small per-chain reduction matmuls (fhat must not round through bf16).
- **NaN/Inf containment** (see the in-kernel comment): every operand of a
  cross-lane contraction is scrubbed and per-chain scrub counts force-reject
  dirty chains — without this, one diverged chain's NaN*0 poisons its whole
  CB-block through the masked reduction matmuls.

Semantics match ``make_sgld_step`` (polar transport, langevin on/off) with the
same update law; noise streams differ (TPU PRNG vs threefry), so cross-path
tests are exact with ``langevin=False`` and statistical otherwise — see
``tests/test_pallas_sgld.py``.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _normals(shape):
    """Standard normals via in-kernel PRNG bits + Box–Muller (cos branch).

    Bits are masked to 24 via int32 ops (Mosaic has no uint32->f32 cast)."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    # low 24 bits -> u1 in (0, 1] (log-safe), u2 in [0, 1)
    u1 = (b1 & 0xFFFFFF).astype(jnp.float32) * (1.0 / 16777216.0) + (
        0.5 / 16777216.0
    )
    u2 = (b2 & 0xFFFFFF).astype(jnp.float32) * (1.0 / 16777216.0)
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    return rad * jnp.cos((2.0 * math.pi) * u2)


def _group_matrix(groups: int, width: int, transpose: bool):
    """0/1 chain-membership matrix built from iotas (never leaves VMEM).

    ``transpose=False``: (groups*width, groups) — lane-group -> chain reduce.
    ``transpose=True``:  (groups, groups*width) — chain -> lane-group bcast.
    """
    if transpose:
        row = jax.lax.broadcasted_iota(jnp.int32, (groups, groups * width), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (groups, groups * width), 1)
        return (row == (col // width)).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (groups * width, groups), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (groups * width, groups), 1)
    return ((row // width) == col).astype(jnp.float32)


def _sgld_kernel(
    # static (closed over via functools.partial)
    D, n, r, Q, CB, mc, Mch, ns_iters, langevin, sigma_w2, signal_var, orth_tol,
    tpu_prng, stages, adapt, stiefel, rmsprop, ncls, loo_bf16,
    # refs
    scal_ref, seed_ref, phi_ref, y_ref, wt_ref, ohf_ref, w_ref, U_ref,
    *rest,
):
    rest = list(rest)
    if adapt:
        eta_ref, stable_ref, refs_ref = rest.pop(0), rest.pop(0), rest.pop(0)
    else:
        eta_ref = stable_ref = refs_ref = None
    if rmsprop:
        Gw_ref, GU_ref = rest.pop(0), rest.pop(0)
    else:
        Gw_ref = GU_ref = None
    if tpu_prng or not langevin:
        nw_ref = nU_ref = None
    else:
        nw_ref, nU_ref = rest.pop(0), rest.pop(0)
    wout_ref, Uout_ref, rej_ref = rest.pop(0), rest.pop(0), rest.pop(0)
    if adapt:
        etaout_ref, stableout_ref = rest.pop(0), rest.pop(0)
    else:
        etaout_ref = stableout_ref = None
    if rmsprop:
        Gwout_ref, GUout_ref = rest.pop(0), rest.pop(0)
    else:
        Gwout_ref = GUout_ref = None
    wbar_acc, Ubar_acc, dirty_acc = rest
    c = pl.program_id(0)
    j = pl.program_id(1)
    CBr = CB * r
    CBQ = CB * Q
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    scale = scal_ref[0, 0]
    eps_w = scal_ref[0, 1]
    eps_U = scal_ref[0, 2]

    @pl.when(j == 0)
    def _():
        wbar_acc[...] = jnp.zeros_like(wbar_acc)
        Ubar_acc[...] = jnp.zeros_like(Ubar_acc)
        dirty_acc[...] = jnp.zeros_like(dirty_acc)

    w = w_ref[0]            # (1, CBQ) f32, lanes (chain, q) chain-major
    phi = phi_ref[0]        # (mc, D, n) bf16
    y = y_ref[0]            # (mc, 1) f32
    wt = wt_ref[0]          # (mc, 1) f32

    q2c = _group_matrix(CB, Q, transpose=False)           # (CBQ, CB)
    c2q = _group_matrix(CB, Q, transpose=True)            # (CB, CBQ)
    r2c = _group_matrix(CB, r, transpose=False)           # (CBr, CB)

    # ---- NaN/Inf containment --------------------------------------------
    # Chains share matmul lanes, and a masked reduction matmul does NOT mask
    # non-finite operands: NaN*0 = NaN, so ONE diverged chain's lanes would
    # poison every chain in its block through fhat/g reductions. Rule: every
    # value entering a cross-lane contraction is sanitised
    # (where(isfinite, x, 0)) and the per-chain count of sanitised lanes is
    # accumulated into a dirty flag; dirty chains are force-rejected at the
    # update, exactly like the XLA path's per-chain guard.
    def _scrub(x, groups_mat):
        """(x sanitised, per-chain bad-lane count (1, CB))."""
        ok = jnp.isfinite(x)
        bad01 = jnp.where(ok, f32(0), f32(1))
        bad_cnt = jnp.sum(bad01, axis=0, keepdims=True, dtype=f32)
        cnt = jnp.dot(bad_cnt, groups_mat, preferred_element_type=f32,
                      precision=_HI)                      # (1, CB)
        return jnp.where(ok, x, f32(0)), cnt

    w_c, dirty = _scrub(w, q2c)                           # (1, CBQ), (1, CB)

    # ---- forward: temp -> g -> V -> fhat --------------------------------
    # g_d[i, (chain, q)] = <phi_d(x_i), U_d[:, (chain, I[q, d])]> via the
    # block-diagonal one-hot expansion (the reference's computeV gather,
    # GPT_SGLD.jl:208-220, as a lane-layout MXU matmul).
    # loo_bf16 (the VMEM-compact mode for big D·Q, e.g. segment-classification
    # Q=200, D=16): the D retained g_d and their suffix products are held in
    # bf16, halving the backward working set — the same "perturbs an
    # already-stochastic gradient" class as the bf16 likelihood matmuls; V
    # and fhat stay f32 (fhat must not round through bf16).
    keep = bf16 if loo_bf16 else f32
    gs = []
    Ucs = []
    V = None
    for d in range(D):
        Uc, cnt = _scrub(U_ref[0, d], r2c)                # (n, CBr) f32
        Ucs.append(Uc)
        dirty = dirty + cnt
        temp = jnp.dot(phi[:, d, :], Uc.astype(bf16),
                       preferred_element_type=f32)        # (mc, CBr)
        if "expand" in stages:
            g = jnp.dot(temp.astype(bf16), ohf_ref[d],
                        preferred_element_type=f32)       # (mc, CBQ)
        else:  # timing bisect only: skip the block-one-hot expansion
            g = jax.lax.broadcast_in_dim(temp[:, :1], (mc, CBQ), (0, 1))
        gs.append(g.astype(keep))
        V = g if V is None else V * g

    V, cnt = _scrub(V, q2c)                               # Π g_d can overflow
    dirty = dirty + cnt
    Vw, cnt = _scrub(V * w_c, q2c)
    dirty = dirty + cnt
    fhat = jnp.dot(Vw, q2c, preferred_element_type=f32,
                   precision=_HI)                         # (mc, CB)
    if ncls:
        # CLASSIFICATION (GPTclassification, GPT_SGLD.jl:452-680): the
        # kernel's "chains" are (chain, class) SUPER-chain pairs, class
        # minor within each block (CB % ncls == 0). fhat columns are
        # per-class logits; the residual is the softmax gradient
        # y_onehot - p, with the class-group sum as a membership matmul.
        # Logits are clamped at ±60 (exp overflow guard only; healthy
        # logits are O(1-10), and a clamped chain is in divergence
        # territory the rejection machinery already handles).
        ngrp = CB // ncls
        cls2grp = _group_matrix(ngrp, ncls, transpose=False)  # (CB, ngrp)
        grp2cls = _group_matrix(ngrp, ncls, transpose=True)   # (ngrp, CB)
        efh = jnp.exp(jnp.clip(fhat, -60.0, 60.0))
        denom = jnp.dot(efh, cls2grp, preferred_element_type=f32,
                        precision=_HI)                        # (mc, ngrp)
        denom_b = jnp.dot(denom, grp2cls, preferred_element_type=f32,
                          precision=_HI)                      # (mc, CB)
        p_soft = efh / denom_b
        cls_col = jax.lax.broadcasted_iota(jnp.int32, (mc, CB), 1) % ncls
        y_onehot = (y.astype(jnp.int32) == cls_col).astype(f32)
        gbar = scale * wt * (y_onehot - p_soft)               # (mc, CB)
    else:
        gbar = (scale / signal_var) * wt * (y - fhat)         # (mc, CB)
    okg = jnp.isfinite(gbar)
    bad_g = jnp.sum(jnp.where(okg, f32(0), f32(1)), axis=0, keepdims=True,
                    dtype=f32)
    # gbar is (mc, CB): columns ARE chains, no lane-group reduce needed
    dirty = dirty + bad_g
    gbar = jnp.where(okg, gbar, f32(0))
    gbar_lane = jnp.dot(gbar, c2q, preferred_element_type=f32,
                        precision=_HI)                    # (mc, CBQ)

    wbar_acc[...] += jnp.sum(V * gbar_lane, axis=0, keepdims=True)

    # ---- backward: leave-one-out products -> Ubar accumulation ----------
    if "bwd" in stages:
        Vbar = gbar_lane * w_c                            # (mc, CBQ)
        sufs = [None] * D
        s = None
        for d in range(D - 1, 0, -1):
            s = gs[d] if s is None else s * gs[d]
            sufs[d - 1] = s
        pre = None
        for d in range(D):
            if D == 1:
                loo = jnp.ones_like(Vbar)
            elif d == 0:
                loo = sufs[0]
            elif d == D - 1:
                loo = pre
            else:
                loo = pre * sufs[d]
            gdbar, cnt = _scrub(Vbar * loo, q2c)          # (mc, CBQ)
            dirty = dirty + cnt
            # contract against ohf TRANSPOSED (A @ Bᵀ dot_general) — the
            # separate (D, CBQ, CBr) ohb buffer used to cost as much VMEM as
            # ohf itself, for bits already resident
            tempbar = jax.lax.dot_general(
                gdbar.astype(bf16), ohf_ref[d],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )                                             # (mc, CBr)
            Ubar_acc[d] += jax.lax.dot_general(
                phi[:, d, :], tempbar.astype(bf16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )                                             # (n, CBr)
            pre = gs[d] if pre is None else pre * gs[d]

    dirty_acc[...] += dirty

    # ---- parameter update (last data chunk only) ------------------------
    @pl.when(j == Mch - 1)
    def _update():
        if langevin and tpu_prng:
            pltpu.prng_seed(seed_ref[0, 0], c)

        def noise_w():
            return _normals((1, CBQ)) if tpu_prng else nw_ref[0]

        def noise_U(d):
            return _normals((n, CBr)) if tpu_prng else nU_ref[0, d]

        # Dirty chains (non-finite lanes scrubbed anywhere this step) are
        # force-rejected: their gradients were computed from zeroed data.
        okd = jnp.where(dirty_acc[...] < 0.5, 1.0, 0.0)   # (1, CB)

        # Per-chain step-size adaptation: eta (1, CB) multiplies eps for
        # each chain's lanes. Stable chains keep eta = 1 (bitwise-identical
        # to the fixed-eps program); a chain that rejects halves its own eta
        # and creeps back up, without slowing its blockmates — the per-chain
        # refinement of SGLDConfig.adapt_eps's fleet-global backoff.
        if adapt:
            eta = eta_ref[0]                              # (1, CB)
            eta_q = jnp.dot(eta, c2q, preferred_element_type=f32,
                            precision=_HI)                # (1, CBQ)
        else:
            eta = None
            eta_q = 1.0

        # RMSprop preconditioner (GPT_SGLD.jl:1121-1237): per-element
        # G <- aG + (1-a)g^2, step scale 1/(lam + sqrt(G)). Second moments
        # update whether or not the step is rejected, like the XLA path.
        if rmsprop:
            rms_alpha = scal_ref[0, 6]
            rms_lambda = scal_ref[0, 7]

        # Euclidean w: x <- x + eps*grad/2 + sqrt(eps)*xi, per-chain NaN reject
        gradw = wbar_acc[...] - w / sigma_w2
        if rmsprop:
            Gw = rms_alpha * Gw_ref[0] + (1.0 - rms_alpha) * gradw * gradw
            Gwout_ref[0] = Gw
            scale_w = 1.0 / (rms_lambda + jnp.sqrt(Gw))   # (1, CBQ)
        else:
            scale_w = 1.0
        w_new = w + 0.5 * eps_w * eta_q * scale_w * gradw
        if langevin:
            w_new = w_new + jnp.sqrt(eps_w * eta_q * scale_w) * noise_w()
        bad_w = jnp.where(jnp.isfinite(w_new), 0.0, 1.0)  # (1, CBQ)
        badc = jnp.dot(bad_w, q2c, preferred_element_type=f32,
                       precision=_HI)                     # (1, CB) counts
        okw = jnp.where(badc < 0.5, 1.0, 0.0) * okd       # (1, CB)
        if adapt:
            # r4 init-scale trust region (XLA path: make_sgld_step) for
            # Euclidean leaves: reject FINITE-but-absurd steps — growth past
            # rel_cap·‖old‖ + rel_slack per step, or past trust·(ref+1)
            # absolute, ref = init-scale norm lanes (refs_ref row 0).
            # Without this the kernel could accept the wedge step the whole
            # mechanism exists to refuse (temperature-Kron ε=1e-6 cascade).
            trust = scal_ref[0, 9]
            rel_cap = scal_ref[0, 10]
            rel_slack = scal_ref[0, 11]
            w_new_s = jnp.where(jnp.isfinite(w_new), w_new, f32(0))
            sq_new = jnp.dot(w_new_s * w_new_s, q2c,
                             preferred_element_type=f32, precision=_HI)
            sq_old = jnp.dot(w_c * w_c, q2c,
                             preferred_element_type=f32, precision=_HI)
            nrm_new = jnp.sqrt(sq_new)                    # (1, CB)
            nrm_old = jnp.sqrt(sq_old)
            ref_w = refs_ref[0, :1]                       # (1, CB)
            ok_trust = jnp.where(
                (nrm_new <= rel_cap * nrm_old + rel_slack)
                & (nrm_new <= trust * (ref_w + 1.0)),
                1.0, 0.0,
            )
            okw = okw * ok_trust
        okw_lane = jnp.dot(okw, c2q, preferred_element_type=f32,
                           precision=_HI) > 0.5           # (1, CBQ)
        wout_ref[0] = jnp.where(okw_lane, w_new, w)
        rej = 1.0 - okw                                   # (1, CB)

        # Factor matrices. Stiefel mode: project to tangent, polar-retract,
        # NS-fused divergence check. Euclidean mode (stiefel=False, the
        # r>n / GPNT-style Gaussian-prior factors): plain SGLD update with
        # the -n*U prior gradient (GPT_SGLD.jl:426) and a NaN reject.
        row = jax.lax.broadcasted_iota(jnp.int32, (CBr, CBr), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (CBr, CBr), 1)
        blockmask = (row // r) == (col // r)              # (CBr, CBr) bool
        eye = (row == col).astype(f32)
        c2r = _group_matrix(CB, r, transpose=True)        # (CB, CBr)
        if adapt:
            eta_r = jnp.dot(eta, c2r, preferred_element_type=f32,
                            precision=_HI)                # (1, CBr)
            sqeU = jnp.sqrt(eps_U * eta_r)
        else:
            eta_r = 1.0
            sqeU = jnp.sqrt(eps_U)

        for d in range(D):
            Ucat = Ucs[d]                                 # (n, CBr) sanitised
            Ubar = Ubar_acc[d]
            if not stiefel:
                Ubar = Ubar - n * Ucat                    # N(0, 1/n) prior
            if rmsprop:
                GU = rms_alpha * GU_ref[0, d] + (1.0 - rms_alpha) * Ubar * Ubar
                GUout_ref[0, d] = GU
                scale_U = 1.0 / (rms_lambda + jnp.sqrt(GU))   # (n, CBr)

            if not stiefel:
                eff = eps_U * eta_r * (scale_U if rmsprop else 1.0)
                drift = 0.5 * eff * Ubar
                if langevin:
                    drift = drift + jnp.sqrt(eff) * noise_U(d)
                Unew = Ucat + drift
                bad01 = jnp.where(jnp.isfinite(Unew), 0.0, 1.0)   # (n, CBr)
                bad_lane = jnp.sum(bad01, axis=0, keepdims=True)
                badUc = jnp.dot(bad_lane, r2c, preferred_element_type=f32,
                                precision=_HI)                    # (1, CB)
                okU = jnp.where(badUc < 0.5, 1.0, 0.0) * okd
                if adapt:
                    # trust region per (chain, d) factor matrix (the XLA path
                    # checks the whole U leaf per chain; the kernel's
                    # rejection granularity is per factor — documented)
                    trust = scal_ref[0, 9]
                    rel_cap = scal_ref[0, 10]
                    rel_slack = scal_ref[0, 11]
                    Unew_s = jnp.where(jnp.isfinite(Unew), Unew, f32(0))
                    sq_new = jnp.dot(
                        jnp.sum(Unew_s * Unew_s, axis=0, keepdims=True), r2c,
                        preferred_element_type=f32, precision=_HI)
                    sq_old = jnp.dot(
                        jnp.sum(Ucat * Ucat, axis=0, keepdims=True), r2c,
                        preferred_element_type=f32, precision=_HI)
                    nrm_new = jnp.sqrt(sq_new)            # (1, CB)
                    nrm_old = jnp.sqrt(sq_old)
                    ref_d = refs_ref[0, 1 + d:2 + d]      # (1, CB)
                    okU = okU * jnp.where(
                        (nrm_new <= rel_cap * nrm_old + rel_slack)
                        & (nrm_new <= trust * (ref_d + 1.0)),
                        1.0, 0.0,
                    )
                ok_lane = jnp.dot(okU, c2r, preferred_element_type=f32,
                                  precision=_HI) > 0.5            # (1, CBr)
                Uout_ref[0, d] = jnp.where(ok_lane, Unew, Ucat)
                rej = rej + (1.0 - okU)
                continue

            if rmsprop:
                # geodesics need a scalar time per factor matrix: the mean of
                # the elementwise RMSprop steps (GPT_SGLD.jl:1206-1210),
                # reduced per (chain, d) via a ones-row + lane-group matmul
                ssum = jnp.sum(scale_U, axis=0, keepdims=True)    # (1, CBr)
                smean = jnp.dot(ssum, r2c, preferred_element_type=f32,
                                precision=_HI) / (n * r)          # (1, CB)
                e_mat = eps_U * (eta if adapt else 1.0) * smean   # (1, CB)
                sqeU_d = jnp.sqrt(jnp.dot(e_mat, c2r,
                                          preferred_element_type=f32,
                                          precision=_HI))         # (1, CBr)
            else:
                sqeU_d = sqeU
            G = 0.5 * sqeU_d * Ubar
            if langevin:
                G = G + noise_U(d)
            if "manifold" not in stages:  # timing bisect only
                Uout_ref[0, d] = Ucat + sqeU_d * G
                continue
            # tangent projection: mom = G - U sym(U^T G), blockwise
            # Tangent projection in bf16: its error is a tiny perturbation of
            # the (already stochastic) momentum and any non-tangency it
            # leaves is wiped by the HIGHEST-precision polar correction.
            F1 = jax.lax.dot_general(
                Ucat.astype(bf16), G.astype(bf16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            S = jnp.where(blockmask, 0.5 * (F1 + F1.T), 0.0)
            mom = G - jnp.dot(Ucat.astype(bf16), S.astype(bf16),
                              preferred_element_type=f32)
            X = Ucat + sqeU_d * mom
            # Newton–Schulz polar: X <- X (3I - X^T X)/2; first residual is
            # the divergence signal (healthy ~ eps_U*||mom||^2, diverged >> 1)
            err0 = None
            for it in range(ns_iters):
                # contain non-finite lanes: X@B would leak inf*0 = NaN into
                # every chain of the block; a zeroed frame fails the err0
                # check (|0 - I| = 1) and is rejected, never written.
                X = jnp.where(jnp.isfinite(X), X, 0.0)
                F2 = jax.lax.dot_general(
                    X, X, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=_HI,
                )
                F2m = jnp.where(blockmask, F2, 0.0)
                if it == 0:
                    err0 = jnp.abs(F2m - eye)             # (CBr, CBr)
                B = 1.5 * eye - 0.5 * F2m
                X = jnp.dot(X, B, preferred_element_type=f32, precision=_HI)

            # NaN-robust per-chain divergence test: count entries NOT
            # (< tol) — an IEEE comparison is False for NaN, so NaN counts
            # as bad. (Do NOT reduce err0 with max first: hardware max may
            # drop NaN operands rather than propagate them.)
            bad01 = jnp.where(err0 < orth_tol, 0.0, 1.0)        # (CBr, CBr)
            bad_lane = jnp.sum(bad01, axis=0, keepdims=True)    # (1, CBr)
            badUc = jnp.dot(bad_lane, r2c, preferred_element_type=f32,
                            precision=_HI)                      # (1, CB)
            okU = jnp.where(badUc < 0.5, 1.0, 0.0) * okd        # (1, CB)
            ok_lane = jnp.dot(okU, c2r, preferred_element_type=f32,
                              precision=_HI) > 0.5              # (1, CBr)
            Uout_ref[0, d] = jnp.where(ok_lane, X, U_ref[0, d])
            rej = rej + (1.0 - okU)

        rej_ref[0] = rej.astype(jnp.int32)
        if adapt:
            # per-chain η backoff with the XLA path's adapt_patience rule
            # (make_sgld_step): a rejection zeroes the chain's stable-step
            # counter and halves η; η only regrows after `patience`
            # consecutive clean steps (not on every clean step — the r4
            # kernel's regrow-always drift from the XLA semantics is closed).
            a_down = scal_ref[0, 3]
            a_up = scal_ref[0, 4]
            a_floor = scal_ref[0, 5]
            patience = scal_ref[0, 8]
            rejected_c = rej > 0.5                        # (1, CB)
            stable_new = jnp.where(rejected_c, 0.0, stable_ref[0] + 1.0)
            eta_new = jnp.where(
                rejected_c,
                jnp.maximum(a_floor, eta * a_down),
                jnp.where(stable_new >= patience,
                          jnp.minimum(1.0, eta * a_up), eta),
            )
            etaout_ref[0] = eta_new
            stableout_ref[0] = stable_new


def _fleet_grad_kernel(
    # static
    D, n, r, Q, CB, mc, Mch, signal_var, exact,
    # refs
    scal_ref, phi_ref, y_ref, wt_ref, U_ref, oh_ref, w_ref,
    gw_ref, gU_ref, wbar_acc, Ubar_acc,
):
    """Likelihood-gradient kernel, TWO-STAGE exact layout (r5).

    The r4 version precomputed the FOLDED ``Û_d = U_d E_dᵀ`` (n, CB·Q)
    outside and ran 3-pass (mc, n) @ (n, CB·Q) dots — paying the fold's
    Q/r ≈ 10× matmul-FLOP redundancy on every pass. The r5 component
    breakdown (RECORDS ``gmc_leapfrog_breakdown``) showed this kernel IS
    ~89% of the GMC leapfrog, so the redundancy is the whole game. Now:

    - stage 1: ``temp_d = φ_d @ U_d`` in r-space — 3-pass hi/lo bf16
      decomposition (rel err ~1e-7) at the INTRINSIC (mc, n) @ (n, CB·r)
      shape;
    - stage 2: core-index expansion ``g_d = temp_d @ O_d`` against the
      block-diagonal 0/1 one-hot — 2-pass hi/lo split of temp: since O is
      EXACTLY representable in bf16 and the product is element
      selection/accumulation, ``temph@O + templ@O`` reconstructs
      ``temp@O`` to ~2⁻¹⁷ relative (vs 4e-3 for a plain bf16 pass — the
      level that collapses MH step sizes; 1e-5-class force error only
      perturbs the trajectory, never the accept ratio, since leapfrog is
      reversible for ANY deterministic force field and H itself stays
      HIGHEST).
    - backward mirrors it: 2-pass ``gdbar @ Oᵀ`` back to r-space, then the
      3-pass (n, mc) @ (mc, CB·r) accumulation — and the gradient leaves
      the kernel ALREADY in U-layout (the old out-of-kernel HIGHEST unfold
      einsum disappears).

    Per (chunk, d) matmul passes drop 72M → 33M FLOPs at PP parity shapes
    (measured end-to-end in RECORDS ``gmc_merged_lanes_median``).

    ``exact=False`` (bf16) single-passes both stages — right for
    stochastic-gradient-quality consumers."""
    j = pl.program_id(1)
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    scale = scal_ref[0, 0]

    @pl.when(j == 0)
    def _():
        wbar_acc[...] = jnp.zeros_like(wbar_acc)
        Ubar_acc[...] = jnp.zeros_like(Ubar_acc)

    w = w_ref[0]            # (1, CBQ) f32, lanes (chain, q)
    phi = phi_ref[0]        # (mc, D, n) bf16 (f32 in exact mode)
    y = y_ref[0]            # (mc, 1) f32
    wt = wt_ref[0]          # (mc, 1) f32
    CBQ = CB * Q
    q2c = _group_matrix(CB, Q, transpose=False)           # (CBQ, CB)
    c2q = _group_matrix(CB, Q, transpose=True)            # (CB, CBQ)

    w_c = jnp.where(jnp.isfinite(w), w, f32(0))
    # exact mode: f32 retained tensors. bf16 mode: gs retained bf16 — the
    # LOO backward needs all D live and their (mc, CB·Q) footprint is the
    # kernel's VMEM budget.
    keep = f32 if exact else bf16

    def _dot3(A, B, transpose_a=False):
        """3-pass hi/lo f32-quality dot (Mosaic has no 3-pass precision)."""
        dn = ((((0,) if transpose_a else (1,)), (0,)), ((), ()))
        if not exact:
            return jax.lax.dot_general(
                A, B.astype(bf16), dimension_numbers=dn,
                preferred_element_type=f32)
        Ah = A.astype(bf16)
        Al = (A - Ah.astype(f32)).astype(bf16)
        Bh = B.astype(bf16)
        Bl = (B - Bh.astype(f32)).astype(bf16)
        out = jax.lax.dot_general(Ah, Bh, dimension_numbers=dn,
                                  preferred_element_type=f32)
        out += jax.lax.dot_general(Ah, Bl, dimension_numbers=dn,
                                   preferred_element_type=f32)
        out += jax.lax.dot_general(Al, Bh, dimension_numbers=dn,
                                   preferred_element_type=f32)
        return out

    def _expand(A, O, transpose_o=False):
        """2-pass hi/lo product against an EXACT-bf16 0/1 matrix."""
        dn = (((1,), (1 if transpose_o else 0,)), ((), ()))
        if not exact:
            return jax.lax.dot_general(A.astype(bf16), O,
                                       dimension_numbers=dn,
                                       preferred_element_type=f32)
        Ah = A.astype(bf16)
        Al = (A - Ah.astype(f32)).astype(bf16)
        out = jax.lax.dot_general(Ah, O, dimension_numbers=dn,
                                  preferred_element_type=f32)
        out += jax.lax.dot_general(Al, O, dimension_numbers=dn,
                                   preferred_element_type=f32)
        return out

    gs = []
    V = None
    for d in range(D):
        temp = _dot3(phi[:, d, :], U_ref[0, d])           # (mc, CBr)
        g = _expand(temp, oh_ref[d])                      # (mc, CBQ)
        gs.append(g.astype(keep))
        V = g if V is None else V * g
    V = jnp.where(jnp.isfinite(V), V, f32(0))
    Vw = jnp.where(jnp.isfinite(V * w_c), V * w_c, f32(0))
    fhat = jnp.dot(Vw, q2c, preferred_element_type=f32,
                   precision=_HI)                         # (mc, CB)
    gbar = (scale / signal_var) * wt * (y - fhat)
    gbar = jnp.where(jnp.isfinite(gbar), gbar, f32(0))
    gbar_lane = jnp.dot(gbar, c2q, preferred_element_type=f32,
                        precision=_HI)                    # (mc, CBQ)
    wbar_acc[...] += jnp.sum(V * gbar_lane, axis=0, keepdims=True)

    Vbar = (gbar_lane * w_c).astype(keep)                 # (mc, CBQ)
    sufs = [None] * D
    s = None
    for d in range(D - 1, 0, -1):
        s = gs[d] if s is None else s * gs[d]
        sufs[d - 1] = s
    pre = None
    for d in range(D):
        if D == 1:
            loo = jnp.ones_like(Vbar)
        elif d == 0:
            loo = sufs[0]
        elif d == D - 1:
            loo = pre
        else:
            loo = pre * sufs[d]
        gdbar = Vbar * loo                                # (mc, CBQ)
        # Mosaic's is_finite wants f32; scrub through a cast
        gdbar = jnp.where(jnp.isfinite(gdbar.astype(f32)), gdbar, keep(0))
        tempbar = _expand(gdbar.astype(f32), oh_ref[d],
                          transpose_o=True)               # (mc, CBr)
        Ubar_acc[d] += _dot3(phi[:, d, :], tempbar,
                             transpose_a=True)            # (n, CBr)
        pre = gs[d] if pre is None else pre * gs[d]

    @pl.when(j == Mch - 1)
    def _emit():
        gw_ref[0] = wbar_acc[...]
        for d in range(D):
            gU_ref[0, d] = Ubar_acc[d]


def fleet_grad_likelihood(w3, U4, ohf, phi_b, y_b, wts_b, scalars, *,
                          r: int, signal_var: float, exact: bool = False,
                          interpret: bool = False):
    """Run :func:`_fleet_grad_kernel` over a (chain-blocks, data-chunks)
    grid. ``w3 (NB, 1, CB·Q)`` f32, ``U4 (NB, D, n, CB·r)`` f32 (bf16 ok in
    bf16 mode), ``ohf (D, CB·r, CB·Q)`` bf16 block one-hots
    (:func:`block_onehots`), ``phi_b (Mch, mc, D, n)`` → ``(gw3, gU4 f32)``
    with the U-gradient already in (chain-major) lane layout."""
    NB, one, CBQ = w3.shape
    NB2, D, n, CBr = U4.shape
    Mch, mc, D2, n2 = phi_b.shape
    assert NB == NB2 and D == D2 and n == n2 and one == 1
    CB = CBr // r
    Q = CBQ // CB
    assert CBr == CB * r and CBQ == CB * Q
    kernel = functools.partial(
        _fleet_grad_kernel, D, n, r, Q, CB, mc, Mch, float(signal_var),
        bool(exact))
    return pl.pallas_call(
        kernel,
        grid=(NB, Mch),
        in_specs=[
            pl.BlockSpec((1, 8), lambda c, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mc, D, n), lambda c, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mc, 1), lambda c, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mc, 1), lambda c, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, n, CBr), lambda c, j: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, CBr, CBQ), lambda c, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CBQ), lambda c, j: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, CBQ), lambda c, j: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, n, CBr), lambda c, j: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, 1, CBQ), jnp.float32),
            jax.ShapeDtypeStruct((NB, D, n, CBr), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, CBQ), jnp.float32),
            pltpu.VMEM((D, n, CBr), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, phi_b, y_b, wts_b, U4, ohf, w3)


def make_fused_grad_fn(model, phi: jnp.ndarray, y: jnp.ndarray, *,
                       chain_block: int | None = None,
                       data_chunk: int | None = None,
                       exact: bool = True,
                       interpret: bool = False):
    """Build ``grad_logp(params_chains) -> param-tree gradients`` running the
    whole fleet's full-batch log-joint gradient as ONE fused kernel call.

    The GMC leapfrog hot path (``GPT_SGLD.jl:684-805``): the XLA merged-lane
    gradient is HBM-bound on the D materialised (N, C, Q) core-product
    intermediates (measured 2.3 ms/eval at PP parity shapes, precision-
    independent); this kernel streams the batch in ``data_chunk`` rows with
    every intermediate VMEM-resident, accumulating (∇w, ∇U) across chunks
    in the r5 TWO-STAGE layout (see :func:`_fleet_grad_kernel`: intrinsic
    r-space matmuls + a 2-pass exact one-hot expansion — the r4 folded
    layout's Q/r ≈ 10× matmul redundancy and its out-of-kernel
    fold/unfold HIGHEST einsums are gone). Prior terms are tiny XLA ops
    outside.

    ``exact=True`` (default) keeps ~f32-quality forces — REQUIRED for
    exact-MH consumers: a plain-bf16 force field's ~4e-3 relative error
    surfaces as leapfrog energy error (measured on the PP parity config:
    bf16 forces pushed the dual-averaged step multiplier from ~0.5 to
    0.076, collapsing ESS — RECORDS ``gmc_multichain_diagnostics``). The
    two-stage exact path carries ~1e-5-class error, 100× below that
    threshold — and any deterministic force field preserves MH exactness
    (leapfrog stays reversible; H is computed at HIGHEST outside).
    ``exact=False`` (bf16) remains right for stochastic-gradient-quality
    consumers.
    """
    from gpt_tpu.ops.contraction import core_indicator

    D, n, r, Q = model.D, model.n, model.r, model.Q
    if chain_block is None:
        # expansion passes scale with CB (block-diag redundancy) but small CB
        # re-streams phi per block and starves the MXU. Swept on chip at PP
        # parity shapes: exact (2-pass expansion) bottoms at CB=4/mc=250
        # (1.24 ms/eval vs 1.37 at mc=100, 1.78 at CB=2, 1.83 for the r4
        # folded kernel); bf16 (1-pass) at CB=8/mc=250 (1.00 ms) — the MXU
        # shape win dominates its cheaper redundancy. RECORDS
        # gmc_grad_kernel_bound holds the stream-bound decomposition.
        chain_block = 4 if exact else 8
    if data_chunk is None:
        # the kernel retains D gs + D suffix tensors of (mc, CB·Q): scale the
        # chunk so that working set stays ~8 MB of the 16 MB scoped VMEM
        # (D=8 kin40k at mc=250 measured 22 MB and failed to compile)
        per_row = 2 * D * chain_block * Q * (4 if exact else 2)
        data_chunk = max(50, min(250, (8_000_000 // per_row) // 25 * 25))
    N = int(y.shape[0])
    mc = int(data_chunk)
    Mch = -(-N // mc)
    pad = Mch * mc - N
    phi_pad = jnp.concatenate(
        [phi, jnp.zeros((pad,) + phi.shape[1:], phi.dtype)], axis=0)
    y_pad = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)], axis=0)
    wts = jnp.concatenate(
        [jnp.ones((N,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    wire = jnp.float32 if exact else jnp.bfloat16
    phi_b = phi_pad.astype(wire).reshape(Mch, mc, D, n)
    y_b = jnp.asarray(y_pad, jnp.float32).reshape(Mch, mc, 1)
    wts_b = wts.reshape(Mch, mc, 1)
    onehot = core_indicator(model.I, r, dtype=jnp.float32)  # (Q, D, r)
    # scale=1: the FULL-batch gradient, not a minibatch estimate
    scalars = jnp.array([[1.0, 0, 0, 0, 0, 0, 0, 0]], jnp.float32)
    sigma_w2 = float(model.sigma_w) ** 2
    signal_var = float(model.signal_var)
    stiefel_mode = bool(getattr(model, "stiefel", True))

    def grad_fn(params):
        C = params.w.shape[0]
        CB = 1
        for cand in range(min(chain_block, C), 0, -1):
            if C % cand == 0:
                CB = cand
                break
        NB = C // CB
        ohf = block_onehots(onehot, CB)                  # (D, CBr, CBQ)
        U4 = jnp.transpose(
            params.U.reshape(NB, CB, D, n, r), (0, 2, 3, 1, 4)
        ).reshape(NB, D, n, CB * r).astype(wire)
        w3 = params.w.reshape(NB, 1, CB * Q)
        gw3, gU4 = fleet_grad_likelihood(
            w3, U4, ohf, phi_b, y_b, wts_b, scalars,
            r=r, signal_var=signal_var, exact=exact, interpret=interpret,
        )
        gw = gw3.reshape(C, Q) - params.w / sigma_w2
        gU = jnp.transpose(
            gU4.reshape(NB, D, n, CB, r), (0, 3, 1, 2, 4)
        ).reshape(C, D, n, r)
        if not stiefel_mode:
            gU = gU - n * params.U  # Gaussian N(0, 1/n) prior
        return type(params)(w=gw, U=gU)

    return grad_fn


def block_onehots(onehot: jnp.ndarray, CB: int):
    """Block-diagonal core-index expansion matrix for ``fused_sgld_step``.

    ``onehot`` is the (Q, D, r) core indicator (``ops.contraction.core_indicator``).
    Returns ``ohf (D, CB*r, CB*Q)`` in bf16:
    ``ohf[d, c*r + rho, c'*Q + q] = (c == c') * (I[q, d] == rho)``.
    (The backward contracts against ohf TRANSPOSED via dot_general — the old
    separate ohb buffer doubled the one-hot VMEM for bits already resident.)
    """
    base = jnp.transpose(onehot, (1, 2, 0)).astype(jnp.bfloat16)  # (D, r, Q)
    eye = jnp.eye(CB, dtype=jnp.bfloat16)
    D, r, Q = base.shape
    return jnp.einsum("ce,drq->dcreq", eye, base).reshape(D, CB * r, CB * Q)


def fused_sgld_step(
    w3: jnp.ndarray,      # (NB, 1, CB*Q) f32 — lanes (chain, q) chain-major
    U4: jnp.ndarray,      # (NB, D, n, CB*r) f32
    phi_b: jnp.ndarray,   # (Mch, mc, D, n) bf16 — the minibatch features
    y_b: jnp.ndarray,     # (Mch, mc, 1) f32
    wts: jnp.ndarray,     # (Mch, mc, 1) f32
    ohf: jnp.ndarray,     # (D, CB*r, CB*Q) bf16 — see block_onehots
    scalars: jnp.ndarray, # (1, 12) f32: [scale, eps_w, eps_U, adapt_down, adapt_up, adapt_floor, rms_alpha, rms_lambda, adapt_patience, adapt_trust, adapt_rel_cap, adapt_rel_slack]
    seed: jnp.ndarray,    # (1, 1) int32
    *,
    r: int,
    ns_iters: int = 1,
    langevin: bool = True,
    sigma_w2: float = 1.0,
    signal_var: float = 1.0,
    orth_tol: float = 1e-2,
    interpret: bool = False,
    noise: tuple | None = None,
    stages: tuple = ("expand", "bwd", "manifold"),
    adapt_state: tuple | None = None,  # (eta3, stable3 (NB,1,CB) f32, refs (NB,1+D,CB) f32)
    stiefel: bool = True,
    precond: tuple | None = None,  # (Gw3 (NB,1,CB*Q), GU4 (NB,D,n,CB*r)) f32
    num_classes: int = 0,  # >0: (chain, class) super-chains, softmax residual
    loo_bf16: bool = False,
):
    """One fused SGLD transition for the whole fleet. Returns
    ``(w3_new, U4_new, rejected (NB, 1, CB) int32[, eta3_new, stable3_new][, Gw3, GU4])``.

    ``noise=(nw (NB, 1, CB*Q), nU (NB, D, n, CB*r))`` supplies the Langevin
    normals as inputs instead of the in-kernel TPU PRNG — used on backends
    without ``prng_seed`` support (interpret mode) and for deterministic
    testing.

    ``adapt_state=(eta3, stable3, refs)`` enables per-chain step-size
    adaptation with the FULL r4 XLA-path semantics (``make_sgld_step``):
    each chain's eps scales by its eta; a rejection halves eta
    (scalars[0,3], floored at scalars[0,5]) and zeroes the chain's
    stable-step counter; eta regrows (scalars[0,4], capped at 1) only after
    ``adapt_patience`` (scalars[0,8]) consecutive clean steps. ``refs`` rows
    are per-chain init-scale norms (row 0: w, rows 1..D: U_d) arming the
    trust region on Euclidean leaves — reject finite-but-absurd steps past
    ``adapt_rel_cap·‖old‖ + adapt_rel_slack`` per step or
    ``adapt_trust·(ref+1)`` absolute. Outputs 4/5 carry the updated
    (eta3, stable3).

    ``stiefel=False`` switches the factor update to Euclidean SGLD with the
    Gaussian N(0, 1/n) prior gradient (the reference's ``-n*U`` term,
    ``GPT_SGLD.jl:426``) — the r>n configuration where orthonormal frames do
    not exist. ``precond`` carries the RMSprop second moments (updated
    in-kernel and returned as two extra outputs; the Stiefel step uses the
    per-matrix mean step scale as its scalar geodesic time,
    ``GPT_SGLD.jl:1206-1210``).

    ``loo_bf16`` holds the backward's retained g_d / suffix products in bf16
    — halves the big-D·Q VMEM working set (the Q=200 D=16 classification
    shape exceeds VMEM in f32), perturbing only the already-stochastic
    gradient.
    """
    NB, one, CBQ = w3.shape
    NB2, D, n, CBr = U4.shape
    Mch, mc, D2, n2 = phi_b.shape
    if tuple(scalars.shape) != (1, 12):
        raise ValueError(
            f"scalars must be (1, 12) [scale, eps_w, eps_U, adapt_down, "
            f"adapt_up, adapt_floor, rms_alpha, rms_lambda, adapt_patience, "
            f"adapt_trust, adapt_rel_cap, adapt_rel_slack]; got {scalars.shape}"
        )
    CB = CBr // r
    Q = CBQ // CB
    assert NB == NB2 and D == D2 and n == n2 and one == 1
    assert CBr == CB * r and CBQ == CB * Q
    tpu_prng = noise is None
    adapt = adapt_state is not None
    rmsprop = precond is not None

    kernel = functools.partial(
        _sgld_kernel, D, n, r, Q, CB, mc, Mch, ns_iters, langevin,
        float(sigma_w2), float(signal_var), float(orth_tol), tpu_prng,
        frozenset(stages), adapt, bool(stiefel), rmsprop, int(num_classes),
        bool(loo_bf16),
    )
    if num_classes and CB % num_classes:
        raise ValueError(
            f"chain block {CB} must be a multiple of num_classes "
            f"{num_classes} (class groups may not straddle blocks)"
        )
    w_spec = pl.BlockSpec((1, 1, CBQ), lambda c, j: (c, 0, 0),
                          memory_space=pltpu.VMEM)
    U_spec = pl.BlockSpec((1, D, n, CBr), lambda c, j: (c, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    eta_spec = pl.BlockSpec((1, 1, CB), lambda c, j: (c, 0, 0),
                            memory_space=pltpu.VMEM)
    refs_spec = pl.BlockSpec((1, 1 + D, CB), lambda c, j: (c, 0, 0),
                             memory_space=pltpu.VMEM)
    extra_specs = []
    extra_args = []
    aliases = {6: 0, 7: 1}  # w3 -> w_out, U4 -> U_out (in place)
    extra_out_specs = []
    extra_out_shapes = []
    if adapt:
        eta3, stable3, refs = adapt_state
        for buf in (eta3, stable3):
            extra_specs.append(eta_spec)
            extra_args.append(buf)
            aliases[7 + len(extra_args)] = 3 + len(extra_out_shapes)
            extra_out_specs.append(eta_spec)
            extra_out_shapes.append(
                jax.ShapeDtypeStruct((NB, 1, CB), jnp.float32))
        extra_specs.append(refs_spec)
        extra_args.append(refs)
    if rmsprop:
        for buf, spec, shape in (
            (precond[0], w_spec, (NB, 1, CBQ)),
            (precond[1], U_spec, (NB, D, n, CBr)),
        ):
            extra_specs.append(spec)
            extra_args.append(buf)
            aliases[7 + len(extra_args)] = 3 + len(extra_out_shapes)
            extra_out_specs.append(spec)
            extra_out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
    if not tpu_prng and langevin:
        extra_specs += [w_spec, U_spec]
        extra_args += [noise[0], noise[1]]
    base_out_specs = [
        pl.BlockSpec((1, 1, CBQ), lambda c, j: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, n, CBr), lambda c, j: (c, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, CB), lambda c, j: (c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    base_out_shapes = [
        jax.ShapeDtypeStruct((NB, 1, CBQ), jnp.float32),
        jax.ShapeDtypeStruct((NB, D, n, CBr), jnp.float32),
        jax.ShapeDtypeStruct((NB, 1, CB), jnp.int32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(NB, Mch),
        in_specs=[
            pl.BlockSpec((1, 12), lambda c, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda c, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mc, D, n), lambda c, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mc, 1), lambda c, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mc, 1), lambda c, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, CBr, CBQ), lambda c, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CBQ), lambda c, j: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, n, CBr), lambda c, j: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=base_out_specs + extra_out_specs,
        out_shape=base_out_shapes + extra_out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, CBQ), jnp.float32),
            pltpu.VMEM((D, n, CBr), jnp.float32),
            pltpu.VMEM((1, CB), jnp.float32),
        ],
        # w3/U4 update in place: without aliasing XLA must copy the whole
        # fleet's parameter buffers around every call inside the step scan,
        # which dwarfs the kernel's own cost at large C.
        input_output_aliases=aliases,
        interpret=interpret,
    )(scalars, seed, phi_b, y_b, wts, ohf, w3, U4, *extra_args)
