"""Pallas TPU kernel: the WHOLE stochastic MuZero search in VMEM.

The XLA search (``search/mcts.py``) is one fused program, but its tree tables
are loop-carried HBM buffers: every simulation's traversal/backup re-streams
(B, N, K) tables through HBM, and staging copies for the loop carry were
measured at ~14 ms of the 63 ms device time per B=1024×64-sim batch
(docs/project.md). This kernel runs ALL simulations for a block of G searches
inside one Pallas program: tree tables, network weights and activations stay
in VMEM; HBM traffic is one read of the roots + weights and one write of the
root statistics.

Scope (the training/eval default — ``SearchConfig`` with
``chance_selection="argmax"``, ``pw_c=None``): PUCT at decision nodes,
deterministic p/(1+N) at chance nodes, depth cap, min-max Q normalization,
raw-space value untransform, and BOTH head families — scalar MSE heads
(single packed weight columns) and categorical two-hot heads
(``value_bins``/``reward_bins`` > 1: the full ``(H, bins)`` head matrices
are packed and each expansion takes the h-space expectation in VMEM — one
extra (bins, G) matmul + softmax·support dot per head, VERDICT r4 weak #1).
Dirichlet noise, legality masking and the root h/f evaluation happen OUTSIDE
(they are one full-batch MXU matmul — already optimal); the kernel receives
root hidden states, noised priors and values.

Layout (see /opt/skills/guides/pallas_guide.md):
- G = 128 searches per kernel instance, always the LANE (minor) dimension;
  K = 32 child slots in sublanes. Activations are (H, G), so every dense
  layer is one ``dot_general`` contracting the weight's input dim — no
  transposes anywhere. Bias/LayerNorm vectors are packed column-wise as
  (H, n_vec) so a (H, 1) slice broadcasts over lanes directly.
- Tree tables are node-major ``(N, ·, G)``. TPU has no hardware gather: a
  per-lane row read Σ_n 1[n = node_g]·T[n,·,g] is a broadcast-compare +
  multiply + reduce (pure VPU); per-lane writes use the same masks. Rows
  written at expansion (embedding, priors, reward/discount) are STATIC row
  ``s + 1`` stores — every lane expands the same slot index per simulation.
- Network weights are packed once per generation (``pack_search_params``)
  into stacked tensors; tower layers index them with Python-int offsets so
  the whole matmul chain per expansion unrolls at trace time.

VMEM budget (f32, H=128, NB=5, S=50): tables ≈ 6.8 MB + weights ≈ 3.2 MB +
activations < 1 MB — fits Mosaic's 16 MB default scoped-vmem limit.
``weight_dtype=bfloat16`` halves the weight + embedding-table footprint AND
runs every expansion matmul MXU-native (one bf16 pass instead of the 3-pass
f32 decomposition); ``search_vmem_bytes``/``pallas_search_plan`` decide
per-config how the kernel runs. Mosaic's 16 MB limit is a COMPILER DEFAULT,
not the hardware (v5e has 128 MB VMEM/core): configs above it raise the
limit via ``CompilerParams(vmem_limit_bytes=…)``, so the paper-full preset
(H=256, NB=10, S=100 — est. 24 MB bf16 / 41 MB f32) runs WEIGHTS-RESIDENT
up to ``VMEM_BUDGET_BYTES``. Beyond that, ``stream_chunk`` switches the hh
weight pack to double-buffered HBM→VMEM streaming (the path for
≥hidden-512 towers), and only past both does the plan fall back to XLA.

Equivalence: same algorithm and arithmetic as ``search/mcts.py`` up to
float reduction order (Mosaic vs XLA accumulate differently), so tests
compare visit counts exactly and values to tolerance
(``tests/test_pallas_search.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simulate_2048_tpu.models.network import NetworkApplyFns, NetworkParams
from simulate_2048_tpu.search.mcts import PolicyOutput, SearchConfig

Array = jax.Array

BLOCK_G = 128  # searches per kernel instance (lanes); must divide the batch
NEG_INF = -1e9
UNVISITED = -1


# ---------------------------------------------------------------------------
# Parameter packing
# ---------------------------------------------------------------------------


def _unwrap(p):
    return p["params"] if "params" in p else p


def _tower_arrays(tw: dict, num_blocks: int) -> tuple[list, list]:
    """TowerWithHead params → ([H×H mats], [H-vectors]) in kernel order."""
    hh = [tw["Dense_0"]["kernel"]]
    vecs = [tw["Dense_0"]["bias"]]
    rt = tw["ResidualTower_0"]
    for i in range(num_blocks):
        blk = rt[f"DenseResidualBlock_{i}"]
        vecs += [blk["LayerNorm_0"]["scale"], blk["LayerNorm_0"]["bias"]]
        hh.append(blk["Dense_0"]["kernel"])
        vecs.append(blk["Dense_0"]["bias"])
        vecs += [blk["LayerNorm_1"]["scale"], blk["LayerNorm_1"]["bias"]]
        hh.append(blk["Dense_1"]["kernel"])
        vecs.append(blk["Dense_1"]["bias"])
    vecs += [tw["LayerNorm_0"]["scale"], tw["LayerNorm_0"]["bias"]]
    return hh, vecs


def _cat_layout(value_bins: int, reward_bins: int) -> tuple[int, int, int, int]:
    """Column layout of the packed categorical-head tensor.

    Returns ``(v_off, q_off, r_off, cb)``: offsets of the f-value, ψ-q and
    g-reward head segments inside the ``(H, CB)`` pack, and the padded total
    width CB (multiple of 8 sublanes, min 8 so scalar configs still pass a
    well-tiled dummy operand). Heads with ``bins == 1`` stay in the scalar
    pack (``scal``) and get no segment here.
    """
    v_off, q_off = 0, value_bins if value_bins > 1 else 0
    r_off = 2 * value_bins if value_bins > 1 else 0
    cols = r_off + (reward_bins if reward_bins > 1 else 0)
    cb = max(8, -(-cols // 8) * 8)
    return v_off, q_off, r_off, cb


def pack_search_params(
    params: NetworkParams,
    num_blocks: int,
    codebook_size: int,
    weight_dtype=jnp.float32,
    stream_chunk: int | None = None,
    value_bins: int = 1,
    reward_bins: int = 1,
):
    """Stack the f/φ/ψ/g parameters into dense tensors for the kernel.

    Returns ``(hh (n_hh, H, H), vecs (H, n_vec), win (2, K, H),
    wide (2, H, K), wide_b (K, 2), scal (H, 8), scal_b (1, 8),
    cat (H, CB), cat_b (CB, 1))``. The big matmul operands
    (``hh``/``win``/``wide``/``cat``) are stored in ``weight_dtype``
    (bfloat16 halves their VMEM and keeps the MXU in its native dtype);
    LayerNorm/bias vectors and the scalar heads stay float32 (negligible
    size, accumulation-critical). Packing order must match ``_make_kernel``'s
    offsets; both derive from ``num_blocks`` alone so they cannot drift
    independently.

    ``value_bins``/``reward_bins`` describe the HEAD SHAPES (must match the
    networks ``params`` came from): heads with ``bins == 1`` pack their
    single weight column into ``scal``; categorical heads (> 1) pack their
    full ``(H, bins)`` matrix into ``cat`` at :func:`_cat_layout` offsets,
    and the kernel reduces them to scalar expectations in VMEM.

    With ``stream_chunk`` set (the HBM-streaming kernel for configs whose
    weights don't fit VMEM, e.g. the paper-full H=256/NB=10), ``hh`` is
    instead permuted into the kernel's CALL order — φ fuse, φ tower, φ head,
    ψ tower, g fuse, g tower, g head, f tower, i.e. a rotation by the f
    tower's length — and zero-padded to a multiple of ``stream_chunk`` so
    the kernel can double-buffer contiguous chunk DMAs per expansion.
    """
    f = _unwrap(params.prediction)
    phi = _unwrap(params.afterstate_dynamics)
    psi = _unwrap(params.afterstate_prediction)
    g = _unwrap(params.dynamics)

    hh, vecs = [], []

    t_hh, t_v = _tower_arrays(f["TowerWithHead_0"], num_blocks)  # f tower
    hh += t_hh
    vecs += t_v
    hh.append(phi["Dense_0"]["kernel"])  # φ fuse (state side)
    vecs.append(phi["Dense_0"]["bias"] + phi["Dense_1"]["bias"])
    t_hh, t_v = _tower_arrays(phi["TowerWithHead_0"], num_blocks)
    hh += t_hh
    vecs += t_v
    hh.append(phi["afterstate"]["kernel"])
    vecs.append(phi["afterstate"]["bias"])
    t_hh, t_v = _tower_arrays(psi["TowerWithHead_0"], num_blocks)  # ψ tower
    hh += t_hh
    vecs += t_v
    hh.append(g["Dense_0"]["kernel"])  # g fuse (afterstate side)
    vecs.append(g["Dense_0"]["bias"] + g["Dense_1"]["bias"])
    t_hh, t_v = _tower_arrays(g["TowerWithHead_0"], num_blocks)
    hh += t_hh
    vecs += t_v
    hh.append(g["next_state"]["kernel"])
    vecs.append(g["next_state"]["bias"])

    h = hh[0].shape[0]
    k = codebook_size
    a = f["policy_logits"]["kernel"].shape[1]

    wa = phi["Dense_1"]["kernel"]  # (A, H) → pad to (K, H)
    wc = g["Dense_1"]["kernel"]  # (K, H)
    win = jnp.stack([jnp.zeros((k, h)).at[:a].set(wa), wc])

    wp = f["policy_logits"]["kernel"]  # (H, A) → pad to (H, K)
    wch = psi["chance_logits"]["kernel"]  # (H, K)
    wide = jnp.stack([jnp.zeros((h, k)).at[:, :a].set(wp), wch])
    wide_b = jnp.stack(
        [
            jnp.zeros((k,)).at[:a].set(f["policy_logits"]["bias"]),
            psi["chance_logits"]["bias"],
        ]
    ).T  # (K, 2)

    # scalar heads: [f value, ψ q, g reward], padded to 8 output columns;
    # categorical heads go in the cat pack instead (their scal column stays 0)
    scal = jnp.zeros((h, 8))
    scal_b = jnp.zeros((1, 8))
    if value_bins == 1:
        scal = scal.at[:, 0].set(f["value"]["kernel"][:, 0])
        scal = scal.at[:, 1].set(psi["q_value"]["kernel"][:, 0])
        scal_b = scal_b.at[0, 0].set(f["value"]["bias"][0])
        scal_b = scal_b.at[0, 1].set(psi["q_value"]["bias"][0])
    if reward_bins == 1:
        scal = scal.at[:, 2].set(g["reward"]["kernel"][:, 0])
        scal_b = scal_b.at[0, 2].set(g["reward"]["bias"][0])

    v_off, q_off, r_off, cb = _cat_layout(value_bins, reward_bins)
    cat = jnp.zeros((h, cb))
    cat_b = jnp.zeros((cb, 1))
    if value_bins > 1:
        cat = cat.at[:, v_off : v_off + value_bins].set(f["value"]["kernel"])
        cat = cat.at[:, q_off : q_off + value_bins].set(psi["q_value"]["kernel"])
        cat_b = cat_b.at[v_off : v_off + value_bins, 0].set(f["value"]["bias"])
        cat_b = cat_b.at[q_off : q_off + value_bins, 0].set(psi["q_value"]["bias"])
    if reward_bins > 1:
        cat = cat.at[:, r_off : r_off + reward_bins].set(g["reward"]["kernel"])
        cat_b = cat_b.at[r_off : r_off + reward_bins, 0].set(g["reward"]["bias"])

    if stream_chunk is not None:
        tower_hh = 1 + 2 * num_blocks
        hh = hh[tower_hh:] + hh[:tower_hh]  # rotate into call order
        pad = -len(hh) % stream_chunk
        hh = hh + [jnp.zeros_like(hh[0])] * pad
    hh = jnp.stack([x.astype(weight_dtype) for x in hh])
    vecs = jnp.stack([x.astype(jnp.float32) for x in vecs]).T  # (H, n_vec)
    return (
        hh,
        vecs,
        win.astype(weight_dtype),
        wide.astype(weight_dtype),
        wide_b.astype(jnp.float32),
        scal.astype(jnp.float32),
        scal_b.astype(jnp.float32),
        cat.astype(weight_dtype),
        cat_b.astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel(
    cfg: SearchConfig,
    hidden: int,
    num_blocks: int,
    g: int,
    stream_chunk: int | None = None,
):
    s = cfg.num_simulations
    n = s + 1
    k = max(cfg.num_actions, cfg.codebook_size)
    a = cfg.num_actions
    h = hidden
    nb = num_blocks
    max_depth = cfg.max_depth if cfg.max_depth is not None else s + 1
    p = min(max_depth, s + 1)
    eps = cfg.value_transform_epsilon
    gamma = cfg.discount

    vb, rb = cfg.value_bins, cfg.reward_bins
    v_off, q_off, r_off, _ = _cat_layout(vb, rb)
    tower_hh = 1 + 2 * nb
    tower_vec = 3 + 6 * nb
    # offsets into the packed tensors (must mirror pack_search_params)
    F_HH, F_V = 0, 0
    PHI_FUSE_HH, PHI_FUSE_V = F_HH + tower_hh, F_V + tower_vec
    PHI_HH, PHI_V = PHI_FUSE_HH + 1, PHI_FUSE_V + 1
    PHI_HEAD_HH, PHI_HEAD_V = PHI_HH + tower_hh, PHI_V + tower_vec
    PSI_HH, PSI_V = PHI_HEAD_HH + 1, PHI_HEAD_V + 1
    G_FUSE_HH, G_FUSE_V = PSI_HH + tower_hh, PSI_V + tower_vec
    G_HH, G_V = G_FUSE_HH + 1, G_FUSE_V + 1
    G_HEAD_HH, G_HEAD_V = G_HH + tower_hh, G_V + tower_vec

    dn_in = (((0,), (0,)), ((), ()))  # contract weight dim 0 with x dim 0

    def untf(x):
        if eps is None:
            return x
        # h⁻¹ of h(x) = sign(x)(√(|x|+1) − 1) + εx (ops/value_transform.py)
        sign = jnp.sign(x)
        y = jnp.abs(x)
        sq = jnp.sqrt(1.0 + 4.0 * eps * (y + 1.0 + eps)) - 1.0
        return sign * (jnp.square(sq / (2.0 * eps)) - 1.0)

    n_hh_real = 4 * tower_hh + 4
    nchunks = (
        -(-n_hh_real // stream_chunk) if stream_chunk is not None else 0
    )

    def kernel(
        root_h_ref,  # (H, G) root hidden states
        root_p_ref,  # (K, G) root priors (noised + masked outside)
        root_v_ref,  # (1, G) root values (raw space)
        hh_ref,  # (n_hh, H, H) — VMEM resident, or HBM when streaming
        vec_ref,  # (H, n_vec)
        win_ref,  # (2, K, H)
        wide_ref,  # (2, H, K)
        wide_b_ref,  # (K, 2)
        scal_ref,  # (H, 8)
        scal_b_ref,  # (1, 8)
        cat_ref,  # (H, CB) categorical head matrices (dummy when all bins=1)
        cat_b_ref,  # (CB, 1)
        visits_ref,  # out (A, G)
        qval_ref,  # out (A, G)
        rootv_ref,  # out (1, G)
        emb,  # scratch (N, H, G)
        prior,  # scratch (N, K, G)
        cidx,  # scratch (N, K, G) i32
        cvis,  # scratch (N, K, G)
        cval,  # scratch (N, K, G)
        nvis,  # scratch (N, G)
        nval,  # scratch (N, G)
        nrew,  # scratch (N, G)
        ndis,  # scratch (N, G)
        ndec,  # scratch (N, G)  1.0 = decision node
        path_nodes,  # scratch (P, G) i32
        path_edges,  # scratch (P, G) i32
        vbuf,  # scratch (P + 1, G)
        *stream_refs,  # streaming only: wslot (2, C, H, H), wsem DMA((2,))
    ):
        iota_nkg = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
        iota_ng = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        iota_kg = jax.lax.broadcasted_iota(jnp.int32, (k, g), 0)

        def vec(i):  # (H, 1) bias / LayerNorm column
            return vec_ref[:, pl.ds(i, 1)]

        if stream_chunk is None:

            def dense(x, ihh, iv):
                # x (I, G) → (O, G): contraction on the weight's input dim.
                # Activations are cast to the stored weight dtype so a bf16
                # pack runs one native MXU pass; accumulation stays f32.
                w = hh_ref[ihh]
                y = jax.lax.dot_general(
                    w, x.astype(w.dtype), dn_in, preferred_element_type=jnp.float32
                )
                return y + vec(iv)

            def begin_weight_stream():
                pass

        else:
            # HBM → VMEM double-buffered weight streaming: the pack is in
            # CALL order (a rotation by the f tower's length), so each
            # expansion consumes ``hh`` front-to-back in contiguous
            # ``stream_chunk``-sized DMAs. Chunk c+1 is launched before
            # waiting on chunk c; the write to slot (c+1) % 2 is safe because
            # that slot's last reader (chunk c−1's matmuls) ran synchronously
            # before this point in program order.
            wslot, wsem = stream_refs
            _pos = [0]  # trace-time call-order cursor (resets per sim_body)

            def _chunk_copy(c):
                return pltpu.make_async_copy(
                    hh_ref.at[pl.ds(c * stream_chunk, stream_chunk)],
                    wslot.at[c % 2],
                    wsem.at[c % 2],
                )

            def begin_weight_stream():
                _pos[0] = 0
                _chunk_copy(0).start()

            def dense(x, ihh, iv):
                pos = (ihh - tower_hh) % n_hh_real  # offset → call order
                assert pos == _pos[0], (pos, _pos[0])
                _pos[0] += 1
                c, off = divmod(pos, stream_chunk)
                if off == 0:
                    if c + 1 < nchunks:
                        _chunk_copy(c + 1).start()
                    _chunk_copy(c).wait()
                w = wslot[c % 2, off]
                y = jax.lax.dot_general(
                    w, x.astype(w.dtype), dn_in, preferred_element_type=jnp.float32
                )
                return y + vec(iv)

        def layer_norm(x, iv):
            mean = jnp.mean(x, axis=0, keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
            y = (x - mean) * jax.lax.rsqrt(var + 1e-6)
            return y * vec(iv) + vec(iv + 1)

        def tower(x, ihh, iv):
            # TowerWithHead: Dense → NB residual blocks → LN → relu
            x = dense(x, ihh, iv)
            ihh, iv = ihh + 1, iv + 1
            for _ in range(nb):
                r = x
                t = layer_norm(x, iv)
                t = dense(jnp.maximum(t, 0.0), ihh, iv + 2)
                t = layer_norm(t, iv + 3)
                t = dense(jnp.maximum(t, 0.0), ihh + 1, iv + 5)
                x = t + r
                ihh, iv = ihh + 2, iv + 6
            x = layer_norm(x, iv)
            return jnp.maximum(x, 0.0)

        def head(w, x, b):  # w (H, O), x (H, G), b (O, 1) → (O, G)
            y = jax.lax.dot_general(
                w, x.astype(w.dtype), dn_in, preferred_element_type=jnp.float32
            )
            return y + b

        def cat_expect(x, off, bins, support_max):
            # Categorical head → h-space scalar expectation, all in VMEM:
            # logits (bins, G) = Wᵀx + b, then Σ softmax(logits)·atoms where
            # atoms = iota·step (ops/distributional.py support_atoms — the
            # linspace is materialized from iota, no extra operand). The
            # normalizing division happens once on the (1, G) sums.
            logits = head(cat_ref[:, pl.ds(off, bins)], x, cat_b_ref[pl.ds(off, bins)])
            m = jnp.max(logits, axis=0, keepdims=True)
            e = jnp.exp(logits - m)
            step = support_max / (bins - 1)
            atoms = jax.lax.broadcasted_iota(jnp.int32, (bins, g), 0).astype(
                jnp.float32
            ) * jnp.float32(step)
            num = jnp.sum(e * atoms, axis=0, keepdims=True)
            den = jnp.sum(e, axis=0, keepdims=True)
            return num / den  # (1, G)

        # ---- init tree (scratch persists across grid steps: zero everything)
        emb[:] = jnp.zeros((n, h, g), emb.dtype)
        emb[pl.ds(0, 1)] = root_h_ref[:][None].astype(emb.dtype)
        prior[:] = jnp.zeros((n, k, g), jnp.float32)
        prior[pl.ds(0, 1)] = root_p_ref[:][None]
        cidx[:] = jnp.full((n, k, g), UNVISITED, jnp.int32)
        cvis[:] = jnp.zeros((n, k, g), jnp.float32)
        cval[:] = jnp.zeros((n, k, g), jnp.float32)
        nvis[:] = jnp.zeros((n, g), jnp.float32)
        nvis[pl.ds(0, 1)] = jnp.ones((1, g), jnp.float32)
        nval[:] = jnp.zeros((n, g), jnp.float32)
        nval[pl.ds(0, 1)] = root_v_ref[:]
        nrew[:] = jnp.zeros((n, g), jnp.float32)
        ndis[:] = jnp.ones((n, g), jnp.float32)
        ndec[:] = jnp.zeros((n, g), jnp.float32)
        ndec[pl.ds(0, 1)] = jnp.ones((1, g), jnp.float32)

        def node_mask3(nodes):  # (1, G) i32 → (N, 1, G) f32
            return (iota_nkg == nodes[None]).astype(jnp.float32)

        def read_node_scalar(table, nodes):  # (1, G) values of an (N, G) table
            m2 = (iota_ng == nodes).astype(jnp.float32)
            return jnp.sum(table[:] * m2, axis=0, keepdims=True)

        def pick(nodes):
            """PUCT (decision) / p over 1+N (chance) argmax; returns
            (edge (1,G) i32, next (1,G) i32)."""
            m3 = node_mask3(nodes)
            pr = jnp.sum(prior[:] * m3, axis=0)  # (K, G)
            vis = jnp.sum(cvis[:] * m3, axis=0)
            q = jnp.sum(cval[:] * m3, axis=0)
            ci = jnp.sum(cidx[:].astype(jnp.float32) * m3, axis=0)
            m2 = m3[:, 0, :]
            pv = jnp.sum(nval[:] * m2, axis=0, keepdims=True)  # (1, G)
            pn = jnp.sum(nvis[:] * m2, axis=0, keepdims=True)
            dec = jnp.sum(ndec[:] * m2, axis=0, keepdims=True)

            completed = jnp.where(vis > 0, q, pv)
            lo = jnp.minimum(jnp.min(completed, axis=0, keepdims=True), pv)
            hi = jnp.maximum(jnp.max(completed, axis=0, keepdims=True), pv)
            qt = (completed - lo) / jnp.maximum(hi - lo, 1e-8)
            pb_c = cfg.pb_c_init + jnp.log((pn + cfg.pb_c_base + 1.0) / cfg.pb_c_base)
            puct = qt + pb_c * pr * jnp.sqrt(jnp.maximum(pn, 1.0)) / (1.0 + vis)
            chance = pr / (1.0 + vis)
            score = jnp.where(dec > 0, puct, chance)
            score = jnp.where(pr > 0, score, NEG_INF)
            edge = jnp.argmax(score, axis=0)[None].astype(jnp.int32)  # (1, G)
            w = (iota_kg == edge).astype(jnp.float32)  # (K, G)
            nxt = jnp.round(jnp.sum(ci * w, axis=0, keepdims=True)).astype(jnp.int32)
            return edge, nxt

        def sim_body(si, _):
            new_index = si + 1
            # Launch the first weight chunk now (streaming mode): the whole
            # traversal below overlaps its DMA.
            begin_weight_stream()

            # ---- traversal (lockstep over lanes, frozen once off-tree)
            root = jnp.zeros((1, g), jnp.int32)
            edge0, nxt0 = pick(root)
            path_nodes[pl.ds(0, 1)] = root
            path_edges[pl.ds(0, 1)] = edge0

            def t_cond(st):
                t, parent, e, nxt, depth = st
                return jnp.logical_and(
                    t < p, jnp.any(jnp.logical_and(nxt != UNVISITED, depth >= t))
                )

            def t_body(st):
                t, parent, e, nxt, depth = st
                live = jnp.logical_and(nxt != UNVISITED, depth >= t)  # (1, G)
                node_t = jnp.where(live, nxt, parent)
                edge_t, nxt_t = pick(node_t)
                parent = jnp.where(live, node_t, parent)
                e = jnp.where(live, edge_t, e)
                nxt = jnp.where(live, nxt_t, nxt)
                depth = jnp.where(live, depth + 1, depth)
                path_nodes[pl.ds(t, 1)] = jnp.where(live, node_t, n)
                path_edges[pl.ds(t, 1)] = jnp.where(live, edge_t, 0)
                return t + 1, parent, e, nxt, depth

            st0 = (jnp.int32(1), root, edge0, nxt0, jnp.ones((1, g), jnp.int32))
            _, parent, edge, existing, depth = jax.lax.while_loop(t_cond, t_body, st0)
            # depth (1, G): number of recorded (node, edge) pairs per lane.

            # ---- expansion: evaluate both transition types at (parent, edge)
            mp = node_mask3(parent)  # (N, 1, G)
            parent_emb = jnp.sum(emb[:] * mp, axis=0)  # (H, G)
            parent_dec = jnp.sum(ndec[:] * mp[:, 0, :], axis=0, keepdims=True)

            a_onehot = (iota_kg == jnp.minimum(edge, a - 1)).astype(jnp.float32)
            c_onehot = (iota_kg == jnp.minimum(edge, k - 1)).astype(jnp.float32)

            # φ then ψ (decision parent → chance child)
            fuse_a = dense(parent_emb, PHI_FUSE_HH, PHI_FUSE_V)
            fuse_a = fuse_a + jax.lax.dot_general(
                win_ref[0],
                a_onehot.astype(win_ref.dtype),
                dn_in,
                preferred_element_type=jnp.float32,
            )
            x = tower(fuse_a, PHI_HH, PHI_V)
            afterstate = dense(x, PHI_HEAD_HH, PHI_HEAD_V)
            y = tower(afterstate, PSI_HH, PSI_V)
            if vb > 1:
                q_value = untf(cat_expect(y, q_off, vb, cfg.value_support_max))
            else:
                q_value = untf(
                    head(scal_ref[:, 1:2], y, scal_b_ref[pl.ds(0, 1), pl.ds(1, 1)])
                )  # (1, G)
            chance_logits = head(wide_ref[1], y, wide_b_ref[:, pl.ds(1, 1)])  # (K, G)

            # g then f (chance parent → decision child)
            fuse_c = dense(parent_emb, G_FUSE_HH, G_FUSE_V)
            fuse_c = fuse_c + jax.lax.dot_general(
                win_ref[1],
                c_onehot.astype(win_ref.dtype),
                dn_in,
                preferred_element_type=jnp.float32,
            )
            x = tower(fuse_c, G_HH, G_V)
            hidden_new = dense(x, G_HEAD_HH, G_HEAD_V)
            if rb > 1:
                reward = untf(cat_expect(x, r_off, rb, cfg.reward_support_max))
            else:
                reward = untf(
                    head(scal_ref[:, 2:3], x, scal_b_ref[pl.ds(0, 1), pl.ds(2, 1)])
                )
            z = tower(hidden_new, F_HH, F_V)
            if vb > 1:
                value = untf(cat_expect(z, v_off, vb, cfg.value_support_max))
            else:
                value = untf(
                    head(scal_ref[:, 0:1], z, scal_b_ref[pl.ds(0, 1), pl.ds(0, 1)])
                )
            action_logits = head(wide_ref[0], z, wide_b_ref[:, pl.ds(0, 1)])  # (K, G)

            def pad_softmax(logits, width):
                valid = iota_kg < width
                m = jnp.where(valid, logits / cfg.prior_temperature, NEG_INF)
                m = m - jnp.max(m, axis=0, keepdims=True)
                e = jnp.where(valid, jnp.exp(m), 0.0)
                return e / jnp.sum(e, axis=0, keepdims=True)

            is_dec = parent_dec > 0  # (1, G) decision parent ⇒ chance child
            emb_new = jnp.where(is_dec, afterstate, hidden_new)
            prior_new = jnp.where(
                is_dec, pad_softmax(chance_logits, k), pad_softmax(action_logits, a)
            )
            model_value = jnp.where(is_dec, q_value, value)  # (1, G)
            edge_reward = jnp.where(is_dec, 0.0, reward)
            edge_discount = jnp.where(is_dec, 1.0, gamma)

            # static-row installs at slot si + 1 (unreachable for lanes that
            # hit the depth cap — children_index never points there)
            emb[pl.ds(new_index, 1)] = emb_new[None].astype(emb.dtype)
            prior[pl.ds(new_index, 1)] = prior_new[None]
            nrew[pl.ds(new_index, 1)] = edge_reward
            ndis[pl.ds(new_index, 1)] = edge_discount
            ndec[pl.ds(new_index, 1)] = jnp.where(is_dec, 0.0, 1.0)

            needs_expand = existing == UNVISITED  # (1, G)
            child = jnp.where(needs_expand, new_index, existing)
            mpe = node_mask3(parent) * (iota_kg == edge).astype(jnp.float32)[None]
            cidx[:] = jnp.where(
                (mpe > 0) & needs_expand[None], child[None], cidx[:]
            )

            leaf_value = jnp.where(
                needs_expand,
                model_value,
                read_node_scalar(nval, jnp.maximum(existing, 0)),
            )  # (1, G)

            # ---- backup along the recorded path: position j < depth is pair
            # (path_nodes[j], path_edges[j]); position depth is the leaf.
            def ext_node(j):  # (1, G) node id at extended position j
                stored = path_nodes[pl.ds(jnp.minimum(j, p - 1), 1)]
                return jnp.where(
                    j < depth, stored, jnp.where(j == depth, child, n)
                )

            # backed-up values, computed backward into vbuf
            vbuf[pl.ds(p, 1)] = jnp.where(depth == p, leaf_value, 0.0)

            def bk_body(jj, _):
                j = p - 1 - jj  # p-1 .. 0
                nd_j1 = ext_node(j + 1)
                r_j1 = read_node_scalar(nrew, jnp.minimum(nd_j1, n - 1))
                d_j1 = read_node_scalar(ndis, jnp.minimum(nd_j1, n - 1))
                v_next = jnp.where(
                    j + 1 == depth, leaf_value, vbuf[pl.ds(jnp.minimum(j + 1, p), 1)]
                )
                v_j = r_j1 + d_j1 * v_next
                v_j = jnp.where(j < depth, v_j, 0.0)
                v_j = jnp.where(j == depth, leaf_value, v_j)
                vbuf[pl.ds(j, 1)] = v_j
                return 0

            jax.lax.fori_loop(0, p, bk_body, 0)

            # node stats for positions 0..depth (running-mean value, +1 visit)
            def nd_body(j, _):
                nd_j = ext_node(j)
                v_j = jnp.where(j == depth, leaf_value, vbuf[pl.ds(jnp.minimum(j, p - 1), 1)])
                m2 = (iota_ng == nd_j).astype(jnp.float32)  # (N, G)
                old_vis = nvis[:]
                old_val = nval[:]
                upd = (old_val * old_vis + v_j) / (old_vis + 1.0)
                nval[:] = jnp.where(m2 > 0, upd, old_val)
                nvis[:] = old_vis + m2
                return 0

            jax.lax.fori_loop(0, p + 1, nd_body, 0)

            # edge stats for pairs 0..depth-1: Q = r + γ·V_new(child)
            def ed_body(j, _):
                nd_j = ext_node(j)
                nd_j = jnp.where(j < depth, nd_j, n)  # only real pairs
                ed_j = jnp.where(j < depth, path_edges[pl.ds(jnp.minimum(j, p - 1), 1)], 0)
                cn_j = ext_node(j + 1)
                r_j1 = read_node_scalar(nrew, jnp.minimum(cn_j, n - 1))
                d_j1 = read_node_scalar(ndis, jnp.minimum(cn_j, n - 1))
                v_child = read_node_scalar(nval, jnp.minimum(cn_j, n - 1))
                q_new = r_j1 + d_j1 * v_child  # (1, G)
                m = (
                    (iota_nkg == nd_j[None]).astype(jnp.float32)
                    * (iota_kg == ed_j).astype(jnp.float32)[None]
                )
                cvis[:] = cvis[:] + m
                cval[:] = jnp.where(m > 0, q_new[None], cval[:])
                return 0

            jax.lax.fori_loop(0, p, ed_body, 0)
            return 0

        jax.lax.fori_loop(0, s, sim_body, 0)

        visits_ref[:] = cvis[:][0, 0:a, :]
        qval_ref[:] = cval[:][0, 0:a, :]
        rootv_ref[:] = nval[pl.ds(0, 1)]

    return kernel, n, k, p


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 8))
def _run_packed(
    root_hidden_t: Array,  # (H, B)
    root_probs_t: Array,  # (K, B)
    root_value: Array,  # (1, B)
    cfg: SearchConfig,
    hidden: int,
    num_blocks: int,
    interpret: bool,
    packed=None,
    stream_chunk: int | None = None,
):
    kernel, n, k, p = _make_kernel(cfg, hidden, num_blocks, BLOCK_G, stream_chunk)
    h = hidden
    b = root_hidden_t.shape[1]
    assert b % BLOCK_G == 0, f"batch {b} must be a multiple of {BLOCK_G}"
    grid = (b // BLOCK_G,)
    g = BLOCK_G
    # bf16 weight packs also store the node embeddings bf16: they only feed
    # matmuls that run in bf16 anyway, and the table is the largest scratch.
    emb_dtype = jnp.bfloat16 if packed[0].dtype == jnp.bfloat16 else jnp.float32

    lanes = lambda rows: pl.BlockSpec((rows, g), lambda i: (0, i), memory_space=pltpu.VMEM)
    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    # Streaming mode: hh stays in HBM (ANY) and the kernel double-buffers
    # chunk DMAs through a 2-slot VMEM scratch.
    hh_spec = pl.BlockSpec(memory_space=pl.ANY) if stream_chunk else whole()
    stream_scratch = (
        [
            pltpu.VMEM((2, stream_chunk, h, h), packed[0].dtype),  # wslot
            pltpu.SemaphoreType.DMA((2,)),  # wsem
        ]
        if stream_chunk
        else []
    )

    vmem_estimate = search_vmem_bytes(cfg, hidden, num_blocks, packed[0].dtype, stream_chunk)
    visits, qvals, rootv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[lanes(h), lanes(k), lanes(1), hh_spec] + [whole() for _ in range(8)],
        out_specs=[lanes(cfg.num_actions), lanes(cfg.num_actions), lanes(1)],
        out_shape=[
            jax.ShapeDtypeStruct((cfg.num_actions, b), jnp.float32),
            jax.ShapeDtypeStruct((cfg.num_actions, b), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, h, g), emb_dtype),  # emb
            pltpu.VMEM((n, k, g), jnp.float32),  # prior
            pltpu.VMEM((n, k, g), jnp.int32),  # cidx
            pltpu.VMEM((n, k, g), jnp.float32),  # cvis
            pltpu.VMEM((n, k, g), jnp.float32),  # cval
            pltpu.VMEM((n, g), jnp.float32),  # nvis
            pltpu.VMEM((n, g), jnp.float32),  # nval
            pltpu.VMEM((n, g), jnp.float32),  # nrew
            pltpu.VMEM((n, g), jnp.float32),  # ndis
            pltpu.VMEM((n, g), jnp.float32),  # ndec
            pltpu.VMEM((p, g), jnp.int32),  # path_nodes
            pltpu.VMEM((p, g), jnp.int32),  # path_edges
            pltpu.VMEM((p + 1, g), jnp.float32),  # vbuf
        ]
        + stream_scratch,
        # Raise Mosaic's scoped-vmem limit only when this config actually
        # exceeds the 16 MB compiler default (configs that fit keep the
        # default scheduling exactly); the full config needs ~2× its
        # estimate to cover compiler-staged operands. 2× the plan's maximum
        # admitted estimate (VMEM_BUDGET_BYTES) never exceeds
        # VMEM_LIMIT_BYTES, so a config the plan accepted cannot turn into a
        # Mosaic compile failure here (ADVICE r3).
        compiler_params=(
            pltpu.CompilerParams(
                vmem_limit_bytes=min(VMEM_LIMIT_BYTES, 2 * vmem_estimate)
            )
            if vmem_estimate > 14 * 1024 * 1024
            else None
        ),
        interpret=interpret,
    )(root_hidden_t, root_probs_t, root_value, *packed)
    return visits, qvals, rootv


def run_mcts_pallas(
    params: NetworkParams,
    apply_fns: NetworkApplyFns,
    observations: Array,  # (B, obs_dim)
    keys: Array,  # (B, 2) per-search noise keys
    config: SearchConfig,
    invalid_actions: Array | None = None,
    num_blocks: int | None = None,
    packed=None,
    interpret: bool = False,
    weight_dtype=jnp.float32,
    stream_chunk: int | None = None,
) -> PolicyOutput:
    """Batched stochastic MuZero search, whole-search Pallas kernel.

    Drop-in for ``search.mcts.batched_run_mcts`` for the default config
    (``chance_selection="argmax"``, ``pw_c=None``). Root h/f evaluation and
    Dirichlet noise run outside as full-batch XLA (one MXU matmul); the
    kernel runs all simulations with the tree resident in VMEM.

    ``packed`` (from :func:`pack_search_params`) can be precomputed once per
    parameter version (e.g. per self-play generation). ``stream_chunk``
    selects the HBM-streaming weight path for configs whose weights exceed
    VMEM (see :func:`pallas_search_plan`); a pre-packed ``packed`` must then
    have been built with the same ``stream_chunk``.
    """
    if config.chance_selection != "argmax" or config.pw_c is not None:
        raise NotImplementedError("pallas search covers the argmax/no-widening config")
    if num_blocks is None:
        raise ValueError("num_blocks is required (tower depth of the networks)")

    hidden = apply_fns.representation(params.representation, observations)
    root_logits, root_value = apply_fns.prediction(params.prediction, hidden)
    if config.value_transform_epsilon is not None:
        from simulate_2048_tpu.ops.value_transform import inverse_scale_value

        root_value = inverse_scale_value(root_value, config.value_transform_epsilon)

    root_probs = jax.nn.softmax(root_logits / config.prior_temperature)
    if config.dirichlet_fraction > 0.0:
        noise = jax.vmap(
            lambda kk: jax.random.dirichlet(
                kk, jnp.full((config.num_actions,), config.dirichlet_alpha)
            )
        )(keys)
        root_probs = (
            1.0 - config.dirichlet_fraction
        ) * root_probs + config.dirichlet_fraction * noise
    if invalid_actions is not None:
        root_probs = jnp.where(invalid_actions, 0.0, root_probs)
        root_probs = root_probs / jnp.maximum(
            jnp.sum(root_probs, axis=-1, keepdims=True), 1e-12
        )

    k = max(config.num_actions, config.codebook_size)
    pad = jnp.zeros((root_probs.shape[0], k - config.num_actions), jnp.float32)
    probs_padded = jnp.concatenate([root_probs, pad], axis=-1)

    if packed is None:
        packed = pack_search_params(
            params,
            num_blocks,
            k,
            weight_dtype,
            stream_chunk,
            value_bins=config.value_bins,
            reward_bins=config.reward_bins,
        )

    visits, qvals, rootv = _run_packed(
        hidden.T.astype(jnp.float32),
        probs_padded.T,
        root_value[None].astype(jnp.float32),
        config,
        hidden.shape[-1],
        num_blocks,
        interpret,
        packed=packed,
        stream_chunk=stream_chunk,
    )
    visits = visits.T  # (B, A)
    total = jnp.sum(visits, axis=-1, keepdims=True)
    return PolicyOutput(
        action_weights=visits / jnp.maximum(total, 1.0),
        search_value=rootv[0],
        visit_counts=visits.astype(jnp.int32),
        qvalues=qvals.T,
    )


# ---------------------------------------------------------------------------
# VMEM budget / dispatch support
# ---------------------------------------------------------------------------

# Mosaic's DEFAULT scoped-vmem limit is 16 MB — but that is a compiler
# default, not the hardware: v5e/v5p cores have 128 MB of physical VMEM.
# The kernel raises the limit via CompilerParams(vmem_limit_bytes=
# VMEM_LIMIT_BYTES), so the paper-full H=256×10 preset runs with weights
# RESIDENT (est. 24 MB bf16 / 41 MB f32) instead of falling back to XLA.
# The budget below gates the plan decision; the gap to the limit leaves
# room for Mosaic temporaries (the per-expansion matmul chain materializes
# a few (H, G)/(K, G) activations) and for operands the compiler chooses
# to stage in VMEM (measured: the full-config streaming variant's true
# scoped allocation was est + the full hh pack).
VMEM_LIMIT_BYTES = 100 * 1024 * 1024
# Plan-admission budget. Must satisfy 2 * VMEM_BUDGET_BYTES <=
# VMEM_LIMIT_BYTES: the raised compiler limit is 2× the estimate (the
# measured overshoot for compiler-staged operands), so any estimate the plan
# admits compiles instead of tripping Mosaic's scoped-vmem check (ADVICE
# r3). 50 MB still admits the paper-full preset resident in both dtypes
# (est. 24 MB bf16 / 41 MB f32).
VMEM_BUDGET_BYTES = 50 * 1024 * 1024


def search_vmem_bytes(
    config: SearchConfig,
    hidden: int,
    num_blocks: int,
    weight_dtype=jnp.float32,
    stream_chunk: int | None = None,
) -> int:
    """Estimated VMEM footprint of one kernel instance (scratch + operands).

    Mirrors ``_run_packed``'s scratch shapes and ``pack_search_params``'s
    tensor shapes exactly; used by :func:`pallas_search_plan` to decide the
    Pallas-vs-XLA dispatch per network/search configuration. With
    ``stream_chunk``, the hh weights live in HBM and only the 2-slot chunk
    buffer counts against VMEM.
    """
    s = config.num_simulations
    n = s + 1
    k = max(config.num_actions, config.codebook_size)
    a = config.num_actions
    h = hidden
    g = BLOCK_G
    max_depth = config.max_depth if config.max_depth is not None else s + 1
    p = min(max_depth, s + 1)
    wsize = jnp.dtype(weight_dtype).itemsize
    esize = 2 if jnp.dtype(weight_dtype) == jnp.dtype(jnp.bfloat16) else 4

    tower_hh = 1 + 2 * num_blocks
    tower_vec = 3 + 6 * num_blocks
    n_hh = 4 * tower_hh + 4  # f/φ/ψ/g towers + φ fuse/head + g fuse/head
    n_vec = 4 * tower_vec + 4
    _, _, _, cb = _cat_layout(config.value_bins, config.reward_bins)
    max_bins = max(config.value_bins, config.reward_bins, 1)

    tables = (
        n * h * g * esize  # emb
        + n * k * g * 4 * 4  # prior, cidx, cvis, cval
        + 5 * n * g * 4  # nvis, nval, nrew, ndis, ndec
        + 2 * p * g * 4  # path_nodes, path_edges
        + (p + 1) * g * 4  # vbuf
    )
    hh_vmem = (
        2 * stream_chunk * h * h * wsize  # double-buffered chunk slots
        if stream_chunk is not None
        else n_hh * h * h * wsize
    )
    weights = (
        hh_vmem
        + h * n_vec * 4  # vecs
        + 2 * k * h * wsize * 2  # win + wide
        + k * 2 * 4  # wide_b
        + h * 8 * 4 + 8 * 4  # scal + scal_b
        + h * cb * wsize + cb * 4  # cat + cat_b
        + max_bins * g * 4  # (bins, G) head logits staged per expansion
    )
    blocks = (h + k + 1) * g * 4 + (2 * a + 1) * g * 4  # in/out lanes
    return tables + weights + blocks


def _in_scope(config: SearchConfig, batch_size: int) -> bool:
    return (
        config.chance_selection == "argmax"
        and config.root_selection == "puct"
        and config.pw_c is None
        and batch_size % BLOCK_G == 0
    )


def pallas_search_plan(
    config: SearchConfig,
    hidden: int,
    num_blocks: int,
    batch_size: int,
    weight_dtype=jnp.float32,
) -> int | None:
    """How to run this (network, search, batch) on the Pallas kernel.

    Returns ``None`` (out of scope / no VMEM fit — use the XLA search),
    ``0`` (weights VMEM-resident, the fast path), or a chunk size > 0 (the
    HBM-streaming path for configs whose weights exceed VMEM, e.g. the
    paper-full H=256/NB=10/S=100 preset — larger chunks amortize DMA issue
    latency better, so pick the largest that fits).
    """
    if not _in_scope(config, batch_size):
        return None
    if search_vmem_bytes(config, hidden, num_blocks, weight_dtype) <= VMEM_BUDGET_BYTES:
        return 0
    for chunk in (8, 4, 2, 1):
        if (
            search_vmem_bytes(config, hidden, num_blocks, weight_dtype, chunk)
            <= VMEM_BUDGET_BYTES
        ):
            return chunk
    return None


def pallas_search_supported(
    config: SearchConfig,
    hidden: int,
    num_blocks: int,
    batch_size: int,
    weight_dtype=jnp.float32,
) -> bool:
    """True iff this (network, search, batch) combination can run the kernel
    in SOME mode (VMEM-resident or HBM-streaming weights) — see
    :func:`pallas_search_plan` for which."""
    return pallas_search_plan(config, hidden, num_blocks, batch_size, weight_dtype) is not None


def default_interpret() -> bool:
    """Interpret mode off-TPU (tests on the CPU mesh), compiled on TPU."""
    return jax.default_backend() != "tpu"
