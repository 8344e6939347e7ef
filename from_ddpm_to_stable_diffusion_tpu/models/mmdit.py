"""MMDiT — the SD3 multimodal diffusion transformer (stage 02 capability).

TPU-native re-design of /root/reference/02_stable_diffusion-3/mmdit.py:
- PatchEmbed conv k=p (mmdit.py:9-49), learned pos-embed grid center-cropped
  for variable resolution (:496-515), timestep + pooled-vector embedders
  (:58-112), adaLN "dismantled" blocks with 6-way (or pre_only 2-way)
  modulation (:267-349), JOINT attention: context and latent token streams
  are projected separately, concatenated along the sequence, attended once,
  then split back (block_mixing, :352-371) — here one flash-attention call
  over the (154 + 4096)-token joint sequence. Final adaLN layer + einsum
  unpatchify (:388-409, :517-535).
- hidden = 64·depth, heads = depth (:451-453): head_dim is always 64.

TPU-first choices: NHWC patchify, bf16 compute with fp32 modulation math,
Pallas flash attention for the joint sequence, optional qk RMS/LN norm in
fp32. The last joint block's context side is ``pre_only`` (contributes k/v
only) exactly as the reference.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention_blhd, joint_attention_blhd
from ..ops.quantize import dense_cls as _dense_cls
from ..ops.embeddings import crop_pos_embed, timestep_embedding
from ..ops.groupnorm import layer_norm, rms_norm

Dtype = Any


def modulate(x, shift, scale):
    """adaLN modulation: x·(1+scale) + shift, per-batch (mmdit.py:52-55)."""
    out = x * (1.0 + scale[:, None, :])
    if shift is not None:
        out = out + shift[:, None, :]
    return out


class MLPEmbedder(nn.Module):
    """Dense → SiLU → Dense (TimestepEmbedder / VectorEmbedder MLP shape)."""

    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)


class QKNorm(nn.Module):
    """Per-head-dim q/k normalization ('rms' | 'ln' | None)."""

    kind: Optional[str]
    head_dim: int

    @nn.compact
    def __call__(self, x):
        # x: (B, L, H, D)
        if self.kind is None:
            return x
        scale = self.param("scale", nn.initializers.ones, (self.head_dim,))
        if self.kind == "rms":
            return rms_norm(x, scale, eps=1e-6)
        if self.kind == "ln":
            bias = self.param("bias", nn.initializers.zeros, (self.head_dim,))
            return layer_norm(x, scale, bias, eps=1e-6)
        raise ValueError(self.kind)


class DismantledBlock(nn.Module):
    """adaLN DiT block split into pre_attention / post_attention halves."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    pre_only: bool = False
    qk_norm: Optional[str] = None
    scale_mod_only: bool = False
    dtype: Dtype = jnp.float32
    int8_mm: bool = False   # W8A8 serving path for the FLOPs-mass denses
    moe_experts: Optional[int] = None   # Switch-MoE MLP (parallel/expert)
    moe_mesh: Optional[object] = None   # mesh with an 'expert' axis (EP)

    def setup(self):
        hs = self.hidden_size
        self.head_dim = hs // self.num_heads
        # same layer names on either path → param paths line up with
        # quantize_tree's output (adaLN stays bf16: small and
        # modulation-critical)
        dense = _dense_cls(self.int8_mm)
        self.qkv = dense(3 * hs, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="qkv")
        self.ln_q = QKNorm(self.qk_norm, self.head_dim, name="ln_q")
        self.ln_k = QKNorm(self.qk_norm, self.head_dim, name="ln_k")
        if self.scale_mod_only:
            n_mods = 1 if self.pre_only else 4
        else:
            n_mods = 2 if self.pre_only else 6
        self.adaLN = nn.Dense(n_mods * hs, dtype=self.dtype, name="adaLN")
        if not self.pre_only:
            self.proj = dense(hs, dtype=self.dtype, name="proj")
            if self.moe_experts:
                from ..parallel.expert import SwitchFFN

                # sparse MLP: top-1 Switch routing, experts shardable
                # over the mesh 'expert' axis; aux balance loss sown into
                # the 'losses' collection for the trainer to pick up
                self.moe = SwitchFFN(self.moe_experts,
                                     hidden_mult=int(self.mlp_ratio),
                                     dtype=self.dtype, name="moe")
            else:
                mlp_hidden = int(hs * self.mlp_ratio)
                self.mlp_fc1 = dense(mlp_hidden, dtype=self.dtype,
                                     name="mlp_fc1")
                self.mlp_fc2 = dense(hs, dtype=self.dtype, name="mlp_fc2")

    def _mods(self, c):
        m = self.adaLN(jax.nn.silu(c))
        if self.pre_only:
            if self.scale_mod_only:
                return (None, m), None
            shift, scale = jnp.split(m, 2, axis=-1)
            return (shift, scale), None
        if self.scale_mod_only:
            s_msa, g_msa, s_mlp, g_mlp = jnp.split(m, 4, axis=-1)
            return (None, s_msa), (g_msa, None, s_mlp, g_mlp)
        sh_msa, s_msa, g_msa, sh_mlp, s_mlp, g_mlp = jnp.split(m, 6, axis=-1)
        return (sh_msa, s_msa), (g_msa, sh_mlp, s_mlp, g_mlp)

    def pre_attention(self, x, c):
        """Returns ((q, k, v) each (B, L, H, D), residual_state)."""
        (shift, scale), post_mods = self._mods(c)
        h = layer_norm(x, None, None, eps=1e-6)
        h = modulate(h, shift, scale)
        qkv = self.qkv(h)
        b, l, _ = qkv.shape
        qkv = qkv.reshape(b, l, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = self.ln_q(q)
        k = self.ln_k(k)
        return (q, k, v), (x, post_mods)

    def post_attention(self, attn_out, residual_state):
        """attn_out: (B, L, hidden); applies gated residual + adaLN MLP."""
        x, (g_msa, sh_mlp, s_mlp, g_mlp) = residual_state
        x = x + g_msa[:, None, :] * self.proj(attn_out)
        h = layer_norm(x, None, None, eps=1e-6)
        h = modulate(h, sh_mlp, s_mlp)
        if self.moe_experts:
            h, aux = self.moe(h, mesh=self.moe_mesh)
            self.sow("losses", "moe_aux", aux)
        else:
            h = self.mlp_fc1(h)
            h = jax.nn.gelu(h, approximate=True)
            h = self.mlp_fc2(h)
        return x + g_mlp[:, None, :] * h

    def __call__(self, x, c):
        (q, k, v), (res_x, post_mods) = self.pre_attention(x, c)
        out = attention_blhd(q, k, v)   # (B, L, H, D), transpose-free
        b, l, h, d = out.shape
        out = out.reshape(b, l, h * d)
        return self.post_attention(out, (res_x, post_mods))


class JointBlock(nn.Module):
    """One MMDiT layer: context/x dismantled blocks sharing joint attention.

    ``mesh``/``seq_axis`` switch the joint attention to the exact
    sequence-parallel ring implementation (KV blocks rotate over ICI) —
    the scaling path for joint sequences past one chip.
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    context_pre_only: bool = False
    qk_norm: Optional[str] = None
    dtype: Dtype = jnp.float32
    mesh: Optional[object] = None
    seq_axis: str = "seq"
    seq_impl: str = "ring"   # 'ring' | 'ulysses' (when mesh is set)
    int8_mm: bool = False
    moe_experts: Optional[int] = None
    moe_mesh: Optional[object] = None
    # None = auto ('bounded' iff qk_norm); loaders override to 'online'
    # when qk_norm_logit_bound(params) exceeds BOUNDED_LOGIT_BUDGET
    stability: Optional[str] = None

    def setup(self):
        # MoE on the x (latent-token) stream only: it carries 4096 of the
        # 4250 tokens — the context stream's 154 tokens can't fill expert
        # capacity buckets and stays dense
        self.context_block = DismantledBlock(
            self.hidden_size, self.num_heads, self.mlp_ratio, self.qkv_bias,
            pre_only=self.context_pre_only, qk_norm=self.qk_norm,
            dtype=self.dtype, int8_mm=self.int8_mm)
        self.x_block = DismantledBlock(
            self.hidden_size, self.num_heads, self.mlp_ratio, self.qkv_bias,
            pre_only=False, qk_norm=self.qk_norm, dtype=self.dtype,
            int8_mm=self.int8_mm, moe_experts=self.moe_experts,
            moe_mesh=self.moe_mesh)

    def __call__(self, context, x, c):
        ctx_qkv, ctx_state = self.context_block.pre_attention(context, c)
        x_qkv, x_state = self.x_block.pre_attention(x, c)
        lc = context.shape[1]
        if self.mesh is None:
            # split-KV joint attention: no stream concat, no alignment
            # padding on the dominant x×x call (ops/attention.py::
            # joint_attention_blhd) — exact vs the concatenated call.
            # qk-norm bounds every logit (|scale·q·k| <= sqrt(d)·g_q·g_k),
            # so those models take the fixed-max softmax fast path
            # (measured 1.16x on the x×x kernel, tools/probe_fixed_max.py)
            ctx_attn, x_attn = joint_attention_blhd(
                ctx_qkv, x_qkv,
                stability=self.stability
                or ("bounded" if self.qk_norm else "online"))
            b, _, h, d = x_attn.shape
            ctx_attn = ctx_attn.reshape(b, lc, h * d)
            x_attn = x_attn.reshape(b, -1, h * d)
            new_context = (None if self.context_pre_only
                           else self.context_block.post_attention(ctx_attn,
                                                                  ctx_state))
            return new_context, self.x_block.post_attention(x_attn, x_state)
        # sequence-parallel path: one joint sequence over the mesh axis
        q, k, v = (jnp.concatenate([cq, xq], axis=1)
                   for cq, xq in zip(ctx_qkv, x_qkv))
        from ..parallel.ring_attention import (ring_attention,
                                               ulysses_attention)

        n = self.mesh.shape[self.seq_axis]
        l_actual = q.shape[1]
        pad = (-l_actual) % n
        t = lambda a: a.transpose(0, 2, 1, 3)
        q, k, v = t(q), t(k), t(v)  # SP contract is (B, H, L, D)
        if pad:
            widths = ((0, 0), (0, 0), (0, pad), (0, 0))
            q, k, v = (jnp.pad(a, widths) for a in (q, k, v))
        sp = (ulysses_attention if self.seq_impl == "ulysses"
              else ring_attention)
        out = sp(q, k, v, self.mesh, self.seq_axis,
                 kv_valid_len=l_actual)[:, :, :l_actual]
        b, h, l, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
        ctx_attn, x_attn = out[:, :lc], out[:, lc:]
        new_context = (None if self.context_pre_only
                       else self.context_block.post_attention(ctx_attn,
                                                              ctx_state))
        new_x = self.x_block.post_attention(x_attn, x_state)
        return new_context, new_x


def qk_norm_logit_bound(params, head_dim: int, kind: str = "rms") -> float:
    """Largest |scale·q·k| any attention logit can reach, from the LOADED
    QKNorm gains — the safety certificate for ``stability='bounded'``.

    rms ('rms'): ‖x̂‖₂ = √d exactly, so ‖g⊙x̂‖₂ ≤ max|g|·√d.
    ln  ('ln'):  ‖(x−μ)/σ·g + b‖₂ ≤ max|g|·√d + ‖b‖₂.
    Then |q·k|/√d ≤ term_q·term_k/√d.  Returns the max over all
    (ln_q, ln_k) pairs in the tree.  A checkpoint with unusually large
    gains can exceed the fp32 exp budget (~88, minus ln L for the sum) —
    callers should fall back to the online softmax then (ADVICE r4)."""
    import numpy as np

    def term(node):
        g = np.asarray(node["scale"], np.float64)
        t = float(np.max(np.abs(g))) * math.sqrt(head_dim)
        if kind == "ln" and "bias" in node:
            t += float(np.linalg.norm(np.asarray(node["bias"], np.float64)))
        return t

    worst = 0.0

    def walk(node):
        nonlocal worst
        if not isinstance(node, dict):
            return
        if "ln_q" in node and "ln_k" in node \
                and isinstance(node["ln_q"], dict) \
                and "scale" in node["ln_q"]:
            worst = max(worst,
                        term(node["ln_q"]) * term(node["ln_k"])
                        / math.sqrt(head_dim))
        for v in node.values():
            walk(v)

    walk(params)
    return worst


# fp32 exp overflows at ~88.7 and the softmax sum adds ln(L) ≈ 9 on top;
# bounded-softmax auto-enable requires the certified bound to clear this
# with margin (ADVICE r4: a checkpoint with large learned gains must
# degrade to the online softmax, not overflow).
BOUNDED_LOGIT_BUDGET = 70.0


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    patch_size: int = 2
    in_channels: int = 16
    depth: int = 24                    # hidden = 64·depth, heads = depth
    mlp_ratio: float = 4.0
    adm_in_channels: Optional[int] = 2048
    context_dim: Optional[int] = 4096
    pos_embed_max_size: int = 192
    qk_norm: Optional[str] = None
    qkv_bias: bool = True
    # 'flash' (single-chip Pallas kernel) | 'ring' | 'ulysses'
    # (sequence-parallel over a mesh axis; pass mesh= to MMDiT — see
    # docs/RING_SCALING.md for the crossover analysis)
    attention_impl: str = "flash"
    # W8A8 int8 MXU path for the joint-block projections (serving only;
    # params must come from ops.quantize.quantize_tree)
    int8_mm: bool = False
    # Switch-MoE MLP in every x-stream block (beyond-reference sparse
    # MMDiT): top-1 routing, experts sharded over the mesh 'expert' axis
    # when MMDiT(mesh=) carries one; aux balance losses land in the
    # 'losses' collection (MMDiTTrainer adds them at moe_aux_weight)
    moe_experts: Optional[int] = None
    # softmax stability of the joint attention: None = auto ('bounded'
    # iff qk_norm); loaders set 'online' when qk_norm_logit_bound() of
    # the loaded gains exceeds BOUNDED_LOGIT_BUDGET
    stability: Optional[str] = None

    @property
    def hidden_size(self) -> int:
        return 64 * self.depth


class MMDiT(nn.Module):
    config: MMDiTConfig = MMDiTConfig()
    dtype: Dtype = jnp.float32
    mesh: Optional[object] = None       # required when attention_impl='ring'
    seq_axis: str = "seq"

    @nn.compact
    def __call__(self, x, t, y=None, context=None):
        """x: (B, H, W, C) NHWC latent; t: (B,) timesteps; y: (B, adm)
        pooled conditioning; context: (B, Lc, context_dim). Returns NHWC."""
        cfg = self.config
        hs = cfg.hidden_size
        b, h, w, _ = x.shape
        p = cfg.patch_size
        hp, wp = h // p, w // p

        # patchify: conv k=p s=p → (B, hp·wp, hidden)
        xe = nn.Conv(hs, (p, p), strides=(p, p), padding="VALID",
                     dtype=self.dtype, name="x_embedder")(x.astype(self.dtype))
        xe = xe.reshape(b, hp * wp, hs)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, cfg.pos_embed_max_size**2, hs))
        xe = xe + crop_pos_embed(pos, cfg.pos_embed_max_size, hp,
                                 wp).astype(xe.dtype)

        t_freq = timestep_embedding(t, 256, dtype=self.dtype)
        c = MLPEmbedder(hs, dtype=self.dtype, name="t_embedder")(t_freq)
        if y is not None and cfg.adm_in_channels is not None:
            c = c + MLPEmbedder(hs, dtype=self.dtype, name="y_embedder")(
                y.astype(self.dtype))

        if context is not None and cfg.context_dim is not None:
            context = nn.Dense(hs, dtype=self.dtype,
                               name="context_embedder")(
                                   context.astype(self.dtype))

        sp_mesh = (self.mesh if cfg.attention_impl in ("ring", "ulysses")
                   else None)
        ep_mesh = (self.mesh if (self.mesh is not None and cfg.moe_experts
                                 and "expert" in self.mesh.shape)
                   else None)
        for i in range(cfg.depth):
            context, xe = JointBlock(
                hs, cfg.depth, cfg.mlp_ratio, cfg.qkv_bias,
                context_pre_only=(i == cfg.depth - 1), qk_norm=cfg.qk_norm,
                dtype=self.dtype, mesh=sp_mesh, seq_axis=self.seq_axis,
                seq_impl=cfg.attention_impl, int8_mm=cfg.int8_mm,
                moe_experts=cfg.moe_experts, moe_mesh=ep_mesh,
                stability=cfg.stability,
                name=f"joint_block{i}")(context, xe, c)

        # final adaLN layer → (B, L, p²·C)
        m = nn.Dense(2 * hs, dtype=self.dtype, name="final_adaLN")(
            jax.nn.silu(c))
        shift, scale = jnp.split(m, 2, axis=-1)
        xe = modulate(layer_norm(xe, None, None, eps=1e-6), shift, scale)
        xe = nn.Dense(p * p * cfg.in_channels, dtype=self.dtype,
                      name="final_linear")(xe)

        # unpatchify → NHWC
        xe = xe.reshape(b, hp, wp, p, p, cfg.in_channels)
        xe = jnp.einsum("nhwpqc->nhpwqc", xe)
        return xe.reshape(b, hp * p, wp * p,
                          cfg.in_channels).astype(jnp.float32)


# --------------------------------------------------------------------------
# Pipeline parallelism over the joint-block stack
# --------------------------------------------------------------------------
# The reference flags the JointBlock as its would-be FSDP/PP unit
# (02_stable_diffusion-3/mmdit.py:375); here the homogeneous prefix of the
# stack (blocks 0..depth-2 — the last block is pre_only and structurally
# different) is stage-partitioned over a `stage` mesh axis and driven by
# parallel.pipeline's GPipe/1F1B schedules.  (context, x, c) pack into one
# (B, Lc+Lx+1, hidden) array so microbatches stream through ppermute
# hand-offs as a single tensor.

def stack_joint_block_params(params, n_blocks: int, n_stages: int):
    """joint_block{0..n_blocks-1} param trees → leaves (n_stages, k, ...)."""
    assert n_blocks % n_stages == 0, (n_blocks, n_stages)
    k = n_blocks // n_stages
    blocks = [params[f"joint_block{i}"] for i in range(n_blocks)]
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *blocks)
    return jax.tree_util.tree_map(
        lambda p: p.reshape(n_stages, k, *p.shape[1:]), stacked)


def make_joint_block_stage_fn(cfg: MMDiTConfig, lc: int, k: int,
                              dtype=jnp.float32):
    """stage_fn(params_k, z) applying k consecutive JointBlocks.

    z: (B, Lc+Lx+1, hidden) = [context | x | c-token]; params_k leaves
    have leading dim k (this stage's blocks).
    """
    blk = JointBlock(cfg.hidden_size, cfg.depth, cfg.mlp_ratio,
                     cfg.qkv_bias, context_pre_only=False,
                     qk_norm=cfg.qk_norm, dtype=dtype)

    def stage_fn(params_k, z):
        context, x, c = z[:, :lc], z[:, lc:-1], z[:, -1]
        for j in range(k):
            pj = jax.tree_util.tree_map(lambda p: p[j], params_k)
            context, x = blk.apply({"params": pj}, context, x, c)
        return jnp.concatenate([context, x, c[:, None]], axis=1)

    return stage_fn


def pipelined_joint_blocks(cfg: MMDiTConfig, params, context, x, c, mesh,
                           n_microbatches: int, axis: str = "stage",
                           n_blocks: Optional[int] = None,
                           dtype=jnp.float32):
    """Run the homogeneous joint blocks pipelined over ``axis`` of ``mesh``.

    context: (B, Lc, hidden) EMBEDDED context (post context_embedder);
    x: (B, Lx, hidden) patchified tokens; c: (B, hidden) conditioning.
    Covers blocks 0..n_blocks-1 (default depth-1 — every block except the
    pre_only last); apply that block and the final layer after this.
    Exact vs the sequential stack (tests/test_pipeline.py).  Composes with
    TP: mesh axes beyond ``axis`` are left to GSPMD, so TP-sharded block
    weights keep their head/MLP sharding inside each stage.
    """
    from ..parallel.pipeline import pipeline_apply

    n_blocks = cfg.depth - 1 if n_blocks is None else n_blocks
    n_stages = mesh.shape[axis]
    sp = stack_joint_block_params(params, n_blocks, n_stages)
    lc = context.shape[1]
    z = jnp.concatenate([context, x, c[:, None]], axis=1)
    stage_fn = make_joint_block_stage_fn(cfg, lc, n_blocks // n_stages,
                                         dtype)
    z = pipeline_apply(stage_fn, sp, z, mesh, n_microbatches, axis=axis)
    return z[:, :lc], z[:, lc:-1]


def mmdit_forward_pp(cfg: MMDiTConfig, params, x, t, y, context, mesh,
                     n_microbatches: int, axis: str = "stage",
                     dtype=jnp.float32):
    """Full MMDiT forward with the joint-block stack PIPELINED over
    ``axis``: embeddings and the final (pre_only) block + head run
    replicated; blocks 0..depth-2 stream microbatches through the GPipe
    schedule.  ≡ ``MMDiT.apply`` on one device (tested); same ``params``
    tree — PP is an apply-time choice, not a different checkpoint.
    """
    hs = cfg.hidden_size
    b, h, w, _ = x.shape
    p = cfg.patch_size
    hp, wp = h // p, w // p

    xe = nn.Conv(hs, (p, p), strides=(p, p), padding="VALID",
                 dtype=dtype).apply(
        {"params": params["x_embedder"]}, x.astype(dtype))
    xe = xe.reshape(b, hp * wp, hs)
    xe = xe + crop_pos_embed(params["pos_embed"], cfg.pos_embed_max_size,
                             hp, wp).astype(xe.dtype)

    t_freq = timestep_embedding(t, 256, dtype=dtype)
    c = MLPEmbedder(hs, dtype=dtype).apply(
        {"params": params["t_embedder"]}, t_freq)
    if y is not None and cfg.adm_in_channels is not None:
        c = c + MLPEmbedder(hs, dtype=dtype).apply(
            {"params": params["y_embedder"]}, y.astype(dtype))
    if context is not None and cfg.context_dim is not None:
        context = nn.Dense(hs, dtype=dtype).apply(
            {"params": params["context_embedder"]}, context.astype(dtype))

    context, xe = pipelined_joint_blocks(
        cfg, params, context, xe, c, mesh, n_microbatches, axis=axis,
        dtype=dtype)

    last = JointBlock(hs, cfg.depth, cfg.mlp_ratio, cfg.qkv_bias,
                      context_pre_only=True, qk_norm=cfg.qk_norm,
                      dtype=dtype)
    _, xe = last.apply({"params": params[f"joint_block{cfg.depth - 1}"]},
                       context, xe, c)

    m = nn.Dense(2 * hs, dtype=dtype).apply(
        {"params": params["final_adaLN"]}, jax.nn.silu(c))
    shift, scale = jnp.split(m, 2, axis=-1)
    xe = modulate(layer_norm(xe, None, None, eps=1e-6), shift, scale)
    xe = nn.Dense(p * p * cfg.in_channels, dtype=dtype).apply(
        {"params": params["final_linear"]}, xe)
    xe = xe.reshape(b, hp, wp, p, p, cfg.in_channels)
    xe = jnp.einsum("nhwpqc->nhpwqc", xe)
    return xe.reshape(b, hp * p, wp * p, cfg.in_channels).astype(jnp.float32)
