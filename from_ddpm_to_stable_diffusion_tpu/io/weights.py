"""Weight import: reference .pt / .safetensors checkpoints → Flax pytrees.

Re-implements the reference's two loading paths as a declarative key-mapping
layer (no torch modules involved):
- SD1 ``torch.load`` checkpoints with the ``make_compatible`` renames
  (01_.../stable_diffusion_pytorch/model_loader.py:7-77),
- safetensors attribute-walk loading (02_.../sd3_infer.py:20-44).

Layout conversions (torch → Flax/NHWC):
- Conv2d kernel   (O, I, kH, kW) → (kH, kW, I, O)
- ConvTranspose2d (I, O, kH, kW) → (kH, kW, I, O)
- Linear kernel   (O, I)         → (I, O)
- Norm weight/bias               → scale/bias (unchanged)
- Embedding weight               → embedding (unchanged)

Mapping tables below cover every SD1 module; each maps a torch state-dict
key prefix to a Flax param path. Fused-QKV layers import in_proj weights
directly (row order q|k|v matches our split convention).
"""

from __future__ import annotations

import subprocess
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# File readers
# --------------------------------------------------------------------------
def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pt checkpoint (torch CPU) into {key: float32 numpy}."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.float().numpy() for k, v in state.items()
            if hasattr(v, "numpy")}


def load_safetensors_dict(path: str,
                          prefix: str = "") -> Dict[str, np.ndarray]:
    """Read a .safetensors file into {key: numpy}, optionally filtered and
    stripped by prefix (mirrors load_into's prefix walk).

    Uses the native (C++ mmap) reader — header parse and IO off the GIL,
    tensors copied out of the map so they outlive it — with the
    safetensors package as fallback (FDSD_ST_READER=python forces it).
    """
    import os

    if os.environ.get("FDSD_ST_READER") != "python":
        try:
            from .native import NativeSafetensors

            with NativeSafetensors(path) as f:
                return {k[len(prefix):]: f.get_tensor(k, copy=True)
                        for k in f.keys()
                        if not prefix or k.startswith(prefix)}
        except (OSError, ValueError, subprocess.CalledProcessError):
            # no compiler, unsupported platform, or a dtype/layout the
            # native reader doesn't cover — python fallback
            pass
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            if prefix and not key.startswith(prefix):
                continue
            out[key[len(prefix):]] = np.asarray(f.get_tensor(key))
    return out


_ST_DTYPE_NAMES = {
    "float64": "F64", "float32": "F32", "float16": "F16",
    "bfloat16": "BF16", "int64": "I64", "int32": "I32", "int16": "I16",
    "int8": "I8", "uint8": "U8", "bool": "BOOL",
}


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a nested-dict param tree to {'a/b/c': array} (numpy)."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_tree(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def save_safetensors_dict(tensors: Dict[str, np.ndarray], path: str,
                          metadata: Optional[Dict[str, str]] = None) -> None:
    """Write {key: array} as a .safetensors file (pure Python, no deps).

    The interop EXPORT counterpart of :func:`load_safetensors_dict`:
    anything trained here — full param trees (``flatten_tree`` first),
    EMA mirrors, LoRA adapter sets — becomes one file any safetensors
    consumer can read, including the reference's attribute-walk loader
    (/root/reference/02_stable_diffusion-3/sd3_infer.py:20-44). bf16
    round-trips via its ml_dtypes name. Header is 8-byte aligned with
    spaces per the format's convention.
    """
    import json
    import struct

    header: Dict[str, object] = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v)
                                  for k, v in metadata.items()}
    arrays = []
    offset = 0
    for k in sorted(tensors):
        a = np.ascontiguousarray(tensors[k])
        try:
            name = _ST_DTYPE_NAMES[a.dtype.name]
        except KeyError:
            raise ValueError(
                f"{k}: dtype {a.dtype} has no safetensors encoding")
        header[k] = {"dtype": name, "shape": list(a.shape),
                     "data_offsets": [offset, offset + a.nbytes]}
        arrays.append(a)
        offset += a.nbytes
    hj = json.dumps(header, separators=(",", ":")).encode()
    hj += b" " * ((8 - len(hj) % 8) % 8)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for a in arrays:
            f.write(a.tobytes())


# --------------------------------------------------------------------------
# Tensor layout converters
# --------------------------------------------------------------------------
def t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def t_conv_transpose(w: np.ndarray) -> np.ndarray:
    # torch (I, O, kH, kW) -> flax (kH, kW, I, O), kernel spatially flipped
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def t_dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def t_none(w: np.ndarray) -> np.ndarray:
    return w


# --------------------------------------------------------------------------
# Declarative mapping
# --------------------------------------------------------------------------
# Each rule: torch sub-key -> (flax sub-path, converter). 'W'/'B' denote
# torch 'weight'/'bias'.
def _norm(flax: str) -> List[Tuple[str, str, Callable]]:
    return [("weight", f"{flax}/scale", t_none), ("bias", f"{flax}/bias", t_none)]


def _conv(flax: str) -> List[Tuple[str, str, Callable]]:
    return [("weight", f"{flax}/kernel", t_conv), ("bias", f"{flax}/bias", t_none)]


def _dense(flax: str) -> List[Tuple[str, str, Callable]]:
    return [("weight", f"{flax}/kernel", t_dense), ("bias", f"{flax}/bias", t_none)]


def _dense_nobias(flax: str) -> List[Tuple[str, str, Callable]]:
    return [("weight", f"{flax}/kernel", t_dense)]


def _self_attn(torch_p: str, flax_p: str, qkv_bias: bool
               ) -> List[Tuple[str, str, Callable]]:
    rules = [(f"{torch_p}.in_proj.weight", f"{flax_p}/qkv/kernel", t_dense),
             (f"{torch_p}.out_proj.weight", f"{flax_p}/out/kernel", t_dense),
             (f"{torch_p}.out_proj.bias", f"{flax_p}/out/bias", t_none)]
    if qkv_bias:
        rules.append((f"{torch_p}.in_proj.bias", f"{flax_p}/qkv/bias", t_none))
    return rules


def _cross_attn(torch_p: str, flax_p: str) -> List[Tuple[str, str, Callable]]:
    return [(f"{torch_p}.q_proj.weight", f"{flax_p}/q/kernel", t_dense),
            (f"{torch_p}.k_proj.weight", f"{flax_p}/k/kernel", t_dense),
            (f"{torch_p}.v_proj.weight", f"{flax_p}/v/kernel", t_dense),
            (f"{torch_p}.out_proj.weight", f"{flax_p}/out/kernel", t_dense),
            (f"{torch_p}.out_proj.bias", f"{flax_p}/out/bias", t_none)]


def _prefix(rules: List[Tuple[str, str, Callable]], torch_p: str,
            flax_p: str) -> List[Tuple[str, str, Callable]]:
    return [(f"{torch_p}.{t}" if t else torch_p,
             f"{flax_p}/{f}" if f else flax_p, c) for t, f, c in rules]


def _unet_res(torch_p: str, flax_p: str) -> List[Tuple[str, str, Callable]]:
    """SD1 UNet ResidualBlock (diffusion.py:20-50) field map."""
    out = []
    out += _prefix(_norm("norm1"), f"{torch_p}.groupnorm_feature", flax_p)
    out += _prefix(_conv("conv1"), f"{torch_p}.conv_feature", flax_p)
    out += _prefix(_dense("time_proj"), f"{torch_p}.linear_time", flax_p)
    out += _prefix(_norm("norm2"), f"{torch_p}.groupnorm_merged", flax_p)
    out += _prefix(_conv("conv2"), f"{torch_p}.conv_merged", flax_p)
    out += _prefix(_conv("skip"), f"{torch_p}.residual_layer", flax_p)
    return out


def _unet_att(torch_p: str, flax_p: str) -> List[Tuple[str, str, Callable]]:
    """SD1 UNet AttentionBlock (diffusion.py:54-103) field map."""
    out = []
    out += _prefix(_norm("norm_in"), f"{torch_p}.groupnorm", flax_p)
    out += _prefix(_conv("proj_in"), f"{torch_p}.conv_input", flax_p)
    out += _prefix(_norm("norm1"), f"{torch_p}.layernorm_1", flax_p)
    out += _self_attn(f"{torch_p}.attention_1", f"{flax_p}/attn1",
                      qkv_bias=False)
    out += _prefix(_norm("norm2"), f"{torch_p}.layernorm_2", flax_p)
    out += _cross_attn(f"{torch_p}.attention_2", f"{flax_p}/attn2")
    out += _prefix(_norm("norm3"), f"{torch_p}.layernorm_3", flax_p)
    out += _prefix(_dense("geglu_in"), f"{torch_p}.linear_geglu_1", flax_p)
    out += _prefix(_dense("geglu_out"), f"{torch_p}.linear_geglu_2", flax_p)
    out += _prefix(_conv("proj_out"), f"{torch_p}.conv_output", flax_p)
    return out


def _vae_res(torch_p: str, flax_p: str) -> List[Tuple[str, str, Callable]]:
    out = []
    out += _prefix(_norm("norm1"), f"{torch_p}.groupnorm_1", flax_p)
    out += _prefix(_conv("conv1"), f"{torch_p}.conv_1", flax_p)
    out += _prefix(_norm("norm2"), f"{torch_p}.groupnorm_2", flax_p)
    out += _prefix(_conv("conv2"), f"{torch_p}.conv_2", flax_p)
    out += _prefix(_conv("skip"), f"{torch_p}.residual_layer", flax_p)
    return out


def _vae_att(torch_p: str, flax_p: str) -> List[Tuple[str, str, Callable]]:
    out = _prefix(_norm("norm"), f"{torch_p}.groupnorm", flax_p)
    out += _self_attn(f"{torch_p}.attention", f"{flax_p}/attn", qkv_bias=True)
    return out


def sd1_clip_rules() -> List[Tuple[str, str, Callable]]:
    rules = [("embedding.token_embedding.weight",
              "token_embedding/embedding", t_none),
             ("embedding.position_value", "position_value", t_none)]
    for i in range(12):
        p, f = f"layers.{i}", f"layer{i}"
        rules += _prefix(_norm("ln1"), f"{p}.layernorm_1", f)
        rules += _self_attn(f"{p}.attention", f"{f}/attn", qkv_bias=True)
        rules += _prefix(_norm("ln2"), f"{p}.layernorm_2", f)
        rules += _prefix(_dense("fc1"), f"{p}.linear_1", f)
        rules += _prefix(_dense("fc2"), f"{p}.linear_2", f)
    rules += _prefix(_norm("ln_final"), "layernorm", "")
    return rules


def sd1_unet_rules() -> List[Tuple[str, str, Callable]]:
    """Maps the reference Diffusion state dict (time_embedding/unet/final)."""
    r: List[Tuple[str, str, Callable]] = []
    r += _prefix(_dense("time_fc1"), "time_embedding.linear_1", "")
    r += _prefix(_dense("time_fc2"), "time_embedding.linear_2", "")
    # encoders: (torch index, stage kind) per diffusion.py:133-146
    enc = [("0.0", "conv", "enc0_conv"), ("1.0", "res", "enc1_res"),
           ("1.1", "att", "enc1_att"), ("2.0", "res", "enc2_res"),
           ("2.1", "att", "enc2_att"), ("3.0", "conv", "enc3_down"),
           ("4.0", "res", "enc4_res"), ("4.1", "att", "enc4_att"),
           ("5.0", "res", "enc5_res"), ("5.1", "att", "enc5_att"),
           ("6.0", "conv", "enc6_down"), ("7.0", "res", "enc7_res"),
           ("7.1", "att", "enc7_att"), ("8.0", "res", "enc8_res"),
           ("8.1", "att", "enc8_att"), ("9.0", "conv", "enc9_down"),
           ("10.0", "res", "enc10_res"), ("11.0", "res", "enc11_res")]
    for idx, kind, name in enc:
        p = f"unet.encoders.{idx}"
        if kind == "conv":
            r += _prefix(_conv(name), p, "")
        elif kind == "res":
            r += _unet_res(p, name)
        else:
            r += _unet_att(p, name)
    mid = [("0", "res", "mid_res1"), ("1", "att", "mid_att"),
           ("2", "res", "mid_res2")]
    for idx, kind, name in mid:
        p = f"unet.bottleneck.{idx}"
        r += _unet_res(p, name) if kind == "res" else _unet_att(p, name)
    # decoders per diffusion.py:152-165 (upsample = .conv inside Upsample)
    dec = [("0.0", "res", "dec0_res"), ("1.0", "res", "dec1_res"),
           ("2.0", "res", "dec2_res"), ("2.1", "up", "dec2_up"),
           ("3.0", "res", "dec3_res"), ("3.1", "att", "dec3_att"),
           ("4.0", "res", "dec4_res"), ("4.1", "att", "dec4_att"),
           ("5.0", "res", "dec5_res"), ("5.1", "att", "dec5_att"),
           ("5.2", "up", "dec5_up"), ("6.0", "res", "dec6_res"),
           ("6.1", "att", "dec6_att"), ("7.0", "res", "dec7_res"),
           ("7.1", "att", "dec7_att"), ("8.0", "res", "dec8_res"),
           ("8.1", "att", "dec8_att"), ("8.2", "up", "dec8_up"),
           ("9.0", "res", "dec9_res"), ("9.1", "att", "dec9_att"),
           ("10.0", "res", "dec10_res"), ("10.1", "att", "dec10_att"),
           ("11.0", "res", "dec11_res"), ("11.1", "att", "dec11_att")]
    for idx, kind, name in dec:
        p = f"unet.decoders.{idx}"
        if kind == "res":
            r += _unet_res(p, name)
        elif kind == "att":
            r += _unet_att(p, name)
        else:
            r += _prefix(_conv("conv"), f"{p}.conv", name)
    r += _prefix(_norm("final_norm"), "final.groupnorm", "")
    r += _prefix(_conv("final_conv"), "final.conv", "")
    return r


def sd1_vae_encoder_rules() -> List[Tuple[str, str, Callable]]:
    seq = [("0", "conv", "conv_in"), ("1", "res", "res0"), ("2", "res", "res1"),
           ("3", "conv", "down0"), ("4", "res", "res2"), ("5", "res", "res3"),
           ("6", "conv", "down1"), ("7", "res", "res4"), ("8", "res", "res5"),
           ("9", "conv", "down2"), ("10", "res", "res6"), ("11", "res", "res7"),
           ("12", "res", "res8"), ("13", "att", "mid_attn"),
           ("14", "res", "res9"), ("15", "norm", "norm_out"),
           ("17", "conv", "conv_out"), ("18", "conv", "conv_quant")]
    return _sequential_rules(seq)


def sd1_vae_decoder_rules() -> List[Tuple[str, str, Callable]]:
    seq = [("0", "conv", "conv_in1"), ("1", "conv", "conv_in2"),
           ("2", "res", "res0"), ("3", "att", "mid_attn"),
           ("4", "res", "res1"), ("5", "res", "res2"), ("6", "res", "res3"),
           ("7", "res", "res4"), ("9", "conv", "up0_conv"),
           ("10", "res", "res5"), ("11", "res", "res6"), ("12", "res", "res7"),
           ("14", "conv", "up1_conv"), ("15", "res", "res8"),
           ("16", "res", "res9"), ("17", "res", "res10"),
           ("19", "conv", "up2_conv"), ("20", "res", "res11"),
           ("21", "res", "res12"), ("22", "res", "res13"),
           ("23", "norm", "norm_out"), ("25", "conv", "conv_out")]
    return _sequential_rules(seq)


def _sequential_rules(seq) -> List[Tuple[str, str, Callable]]:
    r: List[Tuple[str, str, Callable]] = []
    for idx, kind, name in seq:
        if kind == "conv":
            r += _prefix(_conv(name), idx, "")
        elif kind == "norm":
            r += _prefix(_norm(name), idx, "")
        elif kind == "res":
            r += _vae_res(idx, name)
        else:
            r += _vae_att(idx, name)
    return r


# --------------------------------------------------------------------------
# SDXL-VAE (diffusers AutoencoderKL) — same architecture as the SD1 VAE,
# different key layout. The reference compares its VQ-VAE against this model
# (03_variational_autoencoder/01_check.py:20-41) and encodes stage-06 latent
# training through it (06_.../03_train_with_vae.py:69).
# --------------------------------------------------------------------------
def _diffusers_vae_res(torch_p: str, flax_p: str
                       ) -> List[Tuple[str, str, Callable]]:
    out = []
    out += _prefix(_norm("norm1"), f"{torch_p}.norm1", flax_p)
    out += _prefix(_conv("conv1"), f"{torch_p}.conv1", flax_p)
    out += _prefix(_norm("norm2"), f"{torch_p}.norm2", flax_p)
    out += _prefix(_conv("conv2"), f"{torch_p}.conv2", flax_p)
    out += _prefix(_conv("skip"), f"{torch_p}.conv_shortcut", flax_p)
    return out


def _diffusers_vae_att(torch_p: str, flax_p: str
                       ) -> List[Tuple[str, str, Callable]]:
    """to_q/to_k/to_v are fused by fuse_diffusers_vae_attn first."""
    return (_prefix(_norm("norm"), f"{torch_p}.group_norm", flax_p)
            + [(f"{torch_p}.qkv_fused.weight", f"{flax_p}/attn/qkv/kernel",
                t_dense),
               (f"{torch_p}.qkv_fused.bias", f"{flax_p}/attn/qkv/bias",
                t_none),
               (f"{torch_p}.to_out.0.weight", f"{flax_p}/attn/out/kernel",
                t_dense),
               (f"{torch_p}.to_out.0.bias", f"{flax_p}/attn/out/bias",
                t_none)])


def fuse_diffusers_vae_attn(state: Dict[str, np.ndarray],
                            prefix: str) -> None:
    """Concat diffusers' separate to_q/to_k/to_v Linears into one fused
    qkv tensor in place (row order q|k|v matches our split convention)."""
    for part in ("weight", "bias"):
        qs = [state.pop(f"{prefix}.to_{x}.{part}", None) for x in "qkv"]
        if qs[0] is not None:
            state[f"{prefix}.qkv_fused.{part}"] = np.concatenate(qs, axis=0)


def sdxl_vae_encoder_rules() -> List[Tuple[str, str, Callable]]:
    r: List[Tuple[str, str, Callable]] = []
    r += _prefix(_conv("conv_in"), "encoder.conv_in", "")
    for level in range(4):
        for block in range(2):
            r += _diffusers_vae_res(
                f"encoder.down_blocks.{level}.resnets.{block}",
                f"res{2 * level + block}")
        if level < 3:
            r += _prefix(_conv(f"down{level}"),
                         f"encoder.down_blocks.{level}.downsamplers.0.conv",
                         "")
    r += _diffusers_vae_res("encoder.mid_block.resnets.0", "res8")
    r += _diffusers_vae_att("encoder.mid_block.attentions.0", "mid_attn")
    r += _diffusers_vae_res("encoder.mid_block.resnets.1", "res9")
    r += _prefix(_norm("norm_out"), "encoder.conv_norm_out", "")
    r += _prefix(_conv("conv_out"), "encoder.conv_out", "")
    r += _prefix(_conv("conv_quant"), "quant_conv", "")
    return r


def sdxl_vae_decoder_rules() -> List[Tuple[str, str, Callable]]:
    r: List[Tuple[str, str, Callable]] = []
    r += _prefix(_conv("conv_in1"), "post_quant_conv", "")
    r += _prefix(_conv("conv_in2"), "decoder.conv_in", "")
    r += _diffusers_vae_res("decoder.mid_block.resnets.0", "res0")
    r += _diffusers_vae_att("decoder.mid_block.attentions.0", "mid_attn")
    r += _diffusers_vae_res("decoder.mid_block.resnets.1", "res1")
    for level in range(4):
        for block in range(3):
            r += _diffusers_vae_res(
                f"decoder.up_blocks.{level}.resnets.{block}",
                f"res{2 + 3 * level + block}")
        if level < 3:
            r += _prefix(_conv(f"up{level}_conv"),
                         f"decoder.up_blocks.{level}.upsamplers.0.conv", "")
    r += _prefix(_norm("norm_out"), "decoder.conv_norm_out", "")
    r += _prefix(_conv("conv_out"), "decoder.conv_out", "")
    return r


def import_sdxl_vae(path: str):
    """Load a diffusers AutoencoderKL .safetensors (e.g. sdxl-vae) into the
    (VAEEncoder params, VAEDecoder params) pair for models.sd1.

    Scaling note: this module pair applies the SD1 latent scale 0.18215 on
    both sides (it cancels on encode→decode roundtrips); diffusers applies
    the SDXL factor 0.13025 externally. Latent-space consumers that need
    diffusers-exact latents must rescale by 0.13025/0.18215.
    """
    state = load_safetensors_dict(path)
    fuse_diffusers_vae_attn(state, "encoder.mid_block.attentions.0")
    fuse_diffusers_vae_attn(state, "decoder.mid_block.attentions.0")
    enc_keys = {k: v for k, v in state.items()
                if k.startswith(("encoder.", "quant_conv."))}
    dec_keys = {k: v for k, v in state.items()
                if k.startswith(("decoder.", "post_quant_conv."))}
    enc = apply_rules(enc_keys, sdxl_vae_encoder_rules())
    dec = apply_rules(dec_keys, sdxl_vae_decoder_rules())
    return enc, dec


# --------------------------------------------------------------------------
# Application
# --------------------------------------------------------------------------
def make_compatible(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Key renames of model_loader.make_compatible (model_loader.py:7-32)."""
    out = {}
    for k, v in state.items():
        k = k.replace("_proj_weight", "_proj.weight")
        k = k.replace("_proj_bias", "_proj.bias")
        out[k] = v
    return out


def apply_rules(state: Dict[str, np.ndarray],
                rules: List[Tuple[str, str, Callable]],
                strict: bool = True) -> Dict[str, Any]:
    """Build a nested Flax params dict from a flat torch state dict."""
    tree: Dict[str, Any] = {}
    used = set()
    for torch_key, flax_path, conv in rules:
        if torch_key not in state:
            # optional keys: skip-projection convs absent when in==out ch
            if flax_path.endswith(("skip/kernel", "skip/bias")):
                continue
            if strict:
                raise KeyError(f"checkpoint missing key {torch_key!r}")
            continue
        used.add(torch_key)
        node = tree
        parts = [p for p in flax_path.split("/") if p]
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = conv(state[torch_key])
    if strict:
        leftover = set(state) - used
        if leftover:
            raise KeyError(f"unmapped checkpoint keys: {sorted(leftover)[:8]}"
                           f" (+{max(0, len(leftover) - 8)} more)")
    return tree


def import_sd1_clip(path: str) -> Dict[str, Any]:
    return apply_rules(make_compatible(load_torch_state_dict(path)),
                       sd1_clip_rules())


def import_sd1_unet(path: str) -> Dict[str, Any]:
    return apply_rules(make_compatible(load_torch_state_dict(path)),
                       sd1_unet_rules())


def import_sd1_vae_encoder(path: str) -> Dict[str, Any]:
    return apply_rules(make_compatible(load_torch_state_dict(path)),
                       sd1_vae_encoder_rules())


def import_sd1_vae_decoder(path: str) -> Dict[str, Any]:
    return apply_rules(make_compatible(load_torch_state_dict(path)),
                       sd1_vae_decoder_rules())
