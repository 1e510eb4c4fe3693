"""Torch checkpoint -> Flax parameter conversion.

The reference ships torch ``.pth`` checkpoints per tool (AgentApp/weights/**
download scripts; load_state_dict with ``params``/``params_ema`` selection —
SwinIR model_serving.py:113-121). This module loads them on CPU torch,
remaps names per model family, transposes layouts:

- Conv2d  (O, I, kh, kw)  -> (kh, kw, I, O)
- Depthwise Conv2d (C, 1, kh, kw) -> (kh, kw, 1, C)
- ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose (kh, kw, I, O)
- Linear  (O, I)          -> (I, O)

and validates the result strictly against the Flax module's own parameter
template (every leaf must exist with the exact shape). Converted trees are
persisted as orbax checkpoints for the engine's weight store.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------- tensor transforms ----------------

def t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def t_dwconv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # (C,1,k,k) -> (k,k,1,C)


def t_convT(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d (I, O, kh, kw); flax ConvTranspose wants
    # (kh, kw, I, O) with spatially-flipped kernels relative to torch.
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def t_id(w: np.ndarray) -> np.ndarray:
    return w


def t_squeeze(w: np.ndarray) -> np.ndarray:
    return np.reshape(w, (-1,))


def t_scalar(w: np.ndarray) -> np.ndarray:
    """(1,) torch tensor (e.g. a shared nn.PReLU alpha) -> () scalar."""
    return np.reshape(w, ())


# ---------------- loading ----------------

def load_torch_checkpoint(path: str | Path,
                          param_key: Optional[str] = "auto",
                          trusted_source: bool = False) -> dict:
    """Load a .pth into {name: np.ndarray}, honoring the reference's
    params/params_ema key selection.

    Tries ``weights_only=True`` first (safe unpickling); legacy zoo
    checkpoints that pickle arbitrary objects require an explicit
    ``trusted_source=True`` opt-in to fall back to full unpickling.
    """
    import torch

    try:
        raw = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        if not trusted_source:
            raise ValueError(
                f"{path} is not loadable with weights_only=True; pass "
                "trusted_source=True only if you trust this checkpoint "
                "(full unpickling can execute arbitrary code)")
        raw = torch.load(str(path), map_location="cpu", weights_only=False)
    if param_key == "auto":
        for key in ("params_ema", "params", "state_dict", "model"):
            if isinstance(raw, dict) and key in raw and \
                    isinstance(raw[key], dict):
                raw = raw[key]
                break
    elif param_key and isinstance(raw, dict) and param_key in raw:
        raw = raw[param_key]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in raw.items()}


# ---------------- mapping engine ----------------

Rule = tuple[str, str, Callable[[np.ndarray], np.ndarray]]


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = jnp.asarray(value)


def convert_state_dict(state: dict, rules: list[Rule],
                       template=None, strict: bool = True,
                       multi: bool = False) -> dict:
    """Apply (regex -> path template, transform) rules to a torch state dict.

    The regex's groups fill ``\\1``-style backrefs in the path template.
    With a template (a flax params tree or eval_shape thereof), validates
    completeness and shapes. ``multi=True`` applies EVERY matching rule to
    a source key (one torch tensor fanning out to several flax leaves,
    e.g. HAT's norm1 feeding both the fused attention LN and the CAB
    branch copy); the default keeps first-match-wins.
    """
    params: dict = {}
    unmatched = []
    for key, value in state.items():
        hit = False
        for pattern, path_tpl, transform in rules:
            m = re.fullmatch(pattern, key)
            if m:
                path = m.expand(path_tpl)
                _set(params, path, transform(np.asarray(value)))
                hit = True
                if not multi:
                    break
        if not hit:
            unmatched.append(key)
    if strict and unmatched:
        raise KeyError(f"unmapped torch keys: {unmatched[:8]}"
                       f"{'...' if len(unmatched) > 8 else ''}")
    out = {"params": params} if template is not None and \
        "params" in template else params
    if template is not None:
        _validate(out, template)
    return out


def _validate(tree, template) -> None:
    flat_t = jax.tree_util.tree_flatten_with_path(template)[0]
    flat_g_paths = {jax.tree_util.keystr(p)
                    for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}
    missing, bad = [], []
    got_by_path = dict(jax.tree_util.tree_flatten_with_path(tree)[0])
    for path, leaf in flat_t:
        key = jax.tree_util.keystr(path)
        if key not in flat_g_paths:
            missing.append(key)
        else:
            got = got_by_path[path]
            if tuple(got.shape) != tuple(leaf.shape):
                bad.append((key, tuple(got.shape), tuple(leaf.shape)))
    extra = flat_g_paths - {jax.tree_util.keystr(p) for p, _ in flat_t}
    problems = []
    if missing:
        problems.append(f"missing: {missing[:6]}")
    if bad:
        problems.append(f"shape mismatches: {bad[:6]}")
    if extra:
        problems.append(f"extra: {sorted(extra)[:6]}")
    if problems:
        raise ValueError("conversion mismatch — " + "; ".join(problems))


def save_as_orbax(params, path: str | Path) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).resolve(), jax.device_get(params), force=True)


# ---------------- per-model rule sets ----------------

def nafnet_rules() -> list[Rule]:
    """Reference NAFNet state-dict names (NAFNet_arch.py) -> models/nafnet.py."""
    rules: list[Rule] = []

    def block_rules(src: str, dst: str) -> list[Rule]:
        out: list[Rule] = []
        for i in (1, 3, 4, 5):
            out.append((rf"{src}\.conv{i}\.weight",
                        rf"{dst}/conv{i}/Conv_0/kernel", t_conv))
            out.append((rf"{src}\.conv{i}\.bias",
                        rf"{dst}/conv{i}/Conv_0/bias", t_id))
        out.append((rf"{src}\.conv2\.weight", rf"{dst}/conv2/Conv_0/kernel",
                    t_dwconv))
        out.append((rf"{src}\.conv2\.bias", rf"{dst}/conv2/Conv_0/bias",
                    t_id))
        out.append((rf"{src}\.sca\.1\.weight", rf"{dst}/sca_conv/Conv_0/kernel",
                    t_conv))
        out.append((rf"{src}\.sca\.1\.bias", rf"{dst}/sca_conv/Conv_0/bias",
                    t_id))
        for nm in ("norm1", "norm2"):
            out.append((rf"{src}\.{nm}\.weight", rf"{dst}/{nm}/weight", t_id))
            out.append((rf"{src}\.{nm}\.bias", rf"{dst}/{nm}/bias", t_id))
        out.append((rf"{src}\.beta", rf"{dst}/beta", t_squeeze))
        out.append((rf"{src}\.gamma", rf"{dst}/gamma", t_squeeze))
        return out

    rules += [(r"intro\.weight", r"intro/Conv_0/kernel", t_conv),
              (r"intro\.bias", r"intro/Conv_0/bias", t_id),
              (r"ending\.weight", r"ending/Conv_0/kernel", t_conv),
              (r"ending\.bias", r"ending/Conv_0/bias", t_id)]
    rules += block_rules(r"encoders\.(\d+)\.(\d+)", r"enc\1_blk\2")
    rules += block_rules(r"decoders\.(\d+)\.(\d+)", r"dec\1_blk\2")
    rules += block_rules(r"middle_blks\.(\d+)", r"mid_blk\1")
    rules += [(r"downs\.(\d+)\.weight", r"down\1/Conv_0/kernel", t_conv),
              (r"downs\.(\d+)\.bias", r"down\1/Conv_0/bias", t_id),
              (r"ups\.(\d+)\.0\.weight", r"up\1/Conv_0/kernel", t_conv)]
    return rules


def swinir_rules(upsampler: str = "pixelshuffle") -> list[Rule]:
    """Reference SwinIR names (network_swinir.py) -> models/swinir.py.

    ``upsampler`` selects the head mapping for the ambiguous
    ``upsample.0`` key: the classical Upsample Sequential's first conv
    ("pixelshuffle") vs the lightweight one-step conv
    ("pixelshuffledirect")."""
    L = r"layers\.(\d+)\.residual_group\.blocks\.(\d+)"
    D = r"layer\1/block\2"
    rules: list[Rule] = [
        (r"conv_first\.weight", r"conv_first/Conv_0/kernel", t_conv),
        (r"conv_first\.bias", r"conv_first/Conv_0/bias", t_id),
        (r"patch_embed\.norm\.weight", r"patch_embed_norm/scale", t_id),
        (r"patch_embed\.norm\.bias", r"patch_embed_norm/bias", t_id),
        (rf"{L}\.norm1\.weight", rf"{D}/attn/norm_scale", t_id),
        (rf"{L}\.norm1\.bias", rf"{D}/attn/norm_bias", t_id),
        (rf"{L}\.norm2\.weight", rf"{D}/norm2_scale", t_id),
        (rf"{L}\.norm2\.bias", rf"{D}/norm2_bias", t_id),
        (rf"{L}\.attn\.relative_position_bias_table",
         rf"{D}/attn/relative_position_bias_table", t_id),
        (rf"{L}\.attn\.relative_position_index", None, None),  # buffer: drop
        (rf"{L}\.attn\.qkv\.weight", rf"{D}/attn/qkv_kernel", t_linear),
        (rf"{L}\.attn\.qkv\.bias", rf"{D}/attn/qkv_bias_p", t_id),
        (rf"{L}\.attn\.proj\.weight", rf"{D}/attn/proj_kernel", t_linear),
        (rf"{L}\.attn\.proj\.bias", rf"{D}/attn/proj_bias_p", t_id),
        (rf"{L}\.mlp\.fc1\.weight", rf"{D}/fc1_kernel", t_linear),
        (rf"{L}\.mlp\.fc1\.bias", rf"{D}/fc1_bias", t_id),
        (rf"{L}\.mlp\.fc2\.weight", rf"{D}/fc2_kernel", t_linear),
        (rf"{L}\.mlp\.fc2\.bias", rf"{D}/fc2_bias", t_id),
        (r"layers\.(\d+)\.conv\.weight", r"layer\1/conv/Conv_0/kernel",
         t_conv),
        (r"layers\.(\d+)\.conv\.bias", r"layer\1/conv/Conv_0/bias", t_id),
        (r"norm\.weight", r"norm/scale", t_id),
        (r"norm\.bias", r"norm/bias", t_id),
        (r"conv_after_body\.weight", r"conv_after_body/Conv_0/kernel",
         t_conv),
        (r"conv_after_body\.bias", r"conv_after_body/Conv_0/bias", t_id),
        (r"conv_before_upsample\.0\.weight",
         r"conv_before_upsample/Conv_0/kernel", t_conv),
        (r"conv_before_upsample\.0\.bias",
         r"conv_before_upsample/Conv_0/bias", t_id),
        (r"conv_last\.weight", r"conv_last/Conv_0/kernel", t_conv),
        (r"conv_last\.bias", r"conv_last/Conv_0/bias", t_id),
        # buffers to drop
        (r".*attn_mask", None, None),
    ]
    # torch Upsample is an nn.Sequential of [conv, PixelShuffle] pairs:
    # indices 0, 2, 4... are convs -> our upsample0, upsample1, ...
    out: list[Rule] = []
    for pat, tpl, tr in rules:
        if tpl is None:
            out.append((pat, "", _drop))
        else:
            out.append((pat, tpl, tr))
    if upsampler == "pixelshuffledirect":
        out += [(r"upsample\.0\.weight",
                 r"upsample_direct/Conv_0/kernel", t_conv),
                (r"upsample\.0\.bias",
                 r"upsample_direct/Conv_0/bias", t_id)]
    for i in range(4):
        out.append((rf"upsample\.{2 * i}\.weight",
                    rf"upsample{i}/Conv_0/kernel", t_conv))
        out.append((rf"upsample\.{2 * i}\.bias",
                    rf"upsample{i}/Conv_0/bias", t_id))
    # Real-SR / GAN heads (003_realSR_BSRGAN_* checkpoints): nearest+conv
    # stages + conv_hr; torch names conv_up{1..3} are our 0-based stages.
    # pixelshuffledirect (lightweight SR) maps upsample.0 -> the one-step
    # conv; unshuffled conv_first (DiffBIR-style) is Sequential index 1.
    for i in (1, 2, 3):
        out.append((rf"conv_up{i}\.weight",
                    rf"conv_up{i - 1}/Conv_0/kernel", t_conv))
        out.append((rf"conv_up{i}\.bias",
                    rf"conv_up{i - 1}/Conv_0/bias", t_id))
    out += [
        (r"conv_hr\.weight", r"conv_hr/Conv_0/kernel", t_conv),
        (r"conv_hr\.bias", r"conv_hr/Conv_0/bias", t_id),
        (r"conv_first\.1\.weight", r"conv_first/Conv_0/kernel", t_conv),
        (r"conv_first\.1\.bias", r"conv_first/Conv_0/bias", t_id),
    ]
    return out


def _drop(w):  # sentinel transform: key intentionally ignored
    return None


def fbcnn_rules_for(nb: int = 4) -> list[Rule]:
    """Exact FBCNN rules for a given nb (block count)."""
    rules: list[Rule] = [
        (r"m_head\.weight", r"head/Conv_0/kernel", t_conv),
        (r"m_head\.bias", r"head/Conv_0/bias", t_id),
        (r"m_tail\.weight", r"tail/Conv_0/kernel", t_conv),
        (r"m_tail\.bias", r"tail/Conv_0/bias", t_id),
    ]

    def res_pair(src, dst):
        return [
            (rf"{src}\.res\.0\.weight", rf"{dst}/c1/Conv_0/kernel", t_conv),
            (rf"{src}\.res\.0\.bias", rf"{dst}/c1/Conv_0/bias", t_id),
            (rf"{src}\.res\.2\.weight", rf"{dst}/c2/Conv_0/kernel", t_conv),
            (rf"{src}\.res\.2\.bias", rf"{dst}/c2/Conv_0/bias", t_id),
        ]

    for k in (1, 2, 3):
        lvl = k - 1
        for i in range(nb):
            rules += res_pair(rf"m_down{k}\.{i}", rf"down{lvl}_res{i}")
        rules += [
            (rf"m_down{k}\.{nb}\.weight",
             rf"down{lvl}_stride/Conv_0/kernel", t_conv),
            (rf"m_down{k}\.{nb}\.bias",
             rf"down{lvl}_stride/Conv_0/bias", t_id),
        ]
    for i in range(nb):
        rules += res_pair(rf"m_body_encoder\.{i}", rf"body_enc{i}")
        rules += res_pair(rf"m_body_decoder\.{i}", rf"body_dec{i}")
        rules += res_pair(rf"qf_pred\.{i}", rf"qf_pred_res{i}")
    for name, lvl in (("m_up3", 2), ("m_up2", 1), ("m_up1", 0)):
        rules += [
            (rf"{name}\.0\.weight", rf"up{lvl}_t/kernel", t_convT),
            (rf"{name}\.0\.bias", rf"up{lvl}_t/bias", t_id),
        ]
        for i in range(nb):
            rules += res_pair(rf"{name}\.{i + 1}", rf"up{lvl}_qf{i}")
    # qf predictor MLP (sequential indices after nb blocks: pool, flatten,
    # then linears at nb+2, nb+4, nb+6)
    for j, fc in ((2, 0), (4, 1), (6, 2)):
        rules += [
            (rf"qf_pred\.{nb + j}\.weight",
             rf"qf_pred_mlp/fc{fc}/kernel", t_linear),
            (rf"qf_pred\.{nb + j}\.bias", rf"qf_pred_mlp/fc{fc}/bias", t_id),
        ]
    # qf embed MLP (linears at 0, 2, 4)
    for j, fc in ((0, 0), (2, 1), (4, 2)):
        rules += [
            (rf"qf_embed\.{j}\.weight", rf"qf_embed/fc{fc}/kernel", t_linear),
            (rf"qf_embed\.{j}\.bias", rf"qf_embed/fc{fc}/bias", t_id),
        ]
    for lvl in (1, 2, 3):
        rules += [
            (rf"to_gamma_{lvl}\.0\.weight",
             rf"to_gamma_{lvl}/fc0/kernel", t_linear),
            (rf"to_gamma_{lvl}\.0\.bias", rf"to_gamma_{lvl}/fc0/bias", t_id),
            (rf"to_beta_{lvl}\.0\.weight",
             rf"to_beta_{lvl}/fc0/kernel", t_linear),
            (rf"to_beta_{lvl}\.0\.bias", rf"to_beta_{lvl}/fc0/bias", t_id),
        ]
    return rules


def restormer_rules() -> list[Rule]:
    """Reference Restormer names (restormer_arch.py) -> models/restormer.py.

    Stage name mapping: encoder_level1.{i} -> encoder_level1_{i}, etc.;
    LayerNorms live under .body; temperature is (heads, 1, 1) -> (heads,).
    """
    stages = ("encoder_level1", "encoder_level2", "encoder_level3",
              "latent", "decoder_level3", "decoder_level2",
              "decoder_level1", "refinement")
    rules: list[Rule] = [
        (r"patch_embed\.proj\.weight", r"patch_embed/Conv_0/kernel", t_conv),
        (r"patch_embed\.proj\.bias", r"patch_embed/Conv_0/bias", t_id),
        (r"output\.weight", r"output/Conv_0/kernel", t_conv),
        (r"output\.bias", r"output/Conv_0/bias", t_id),
        (r"skip_conv\.weight", r"skip_conv/Conv_0/kernel", t_conv),
    ]
    for st in stages:
        S = rf"{st}\.(\d+)"
        D = rf"{st}_\1"
        rules += [
            (rf"{S}\.norm1\.body\.weight", rf"{D}/norm1/weight", t_id),
            (rf"{S}\.norm1\.body\.bias", rf"{D}/norm1/bias", t_id),
            (rf"{S}\.norm2\.body\.weight", rf"{D}/norm2/weight", t_id),
            (rf"{S}\.norm2\.body\.bias", rf"{D}/norm2/bias", t_id),
            (rf"{S}\.attn\.temperature", rf"{D}/attn/temperature", t_squeeze),
            (rf"{S}\.attn\.qkv\.weight", rf"{D}/attn/qkv/Conv_0/kernel",
             t_conv),
            (rf"{S}\.attn\.qkv\.bias", rf"{D}/attn/qkv/Conv_0/bias", t_id),
            (rf"{S}\.attn\.qkv_dwconv\.weight",
             rf"{D}/attn/qkv_dwconv/Conv_0/kernel", t_dwconv),
            (rf"{S}\.attn\.qkv_dwconv\.bias",
             rf"{D}/attn/qkv_dwconv/Conv_0/bias", t_id),
            (rf"{S}\.attn\.project_out\.weight",
             rf"{D}/attn/project_out/Conv_0/kernel", t_conv),
            (rf"{S}\.attn\.project_out\.bias",
             rf"{D}/attn/project_out/Conv_0/bias", t_id),
            (rf"{S}\.ffn\.project_in\.weight",
             rf"{D}/ffn/project_in/Conv_0/kernel", t_conv),
            (rf"{S}\.ffn\.project_in\.bias",
             rf"{D}/ffn/project_in/Conv_0/bias", t_id),
            (rf"{S}\.ffn\.dwconv\.weight",
             rf"{D}/ffn/dwconv/Conv_0/kernel", t_dwconv),
            (rf"{S}\.ffn\.dwconv\.bias", rf"{D}/ffn/dwconv/Conv_0/bias",
             t_id),
            (rf"{S}\.ffn\.project_out\.weight",
             rf"{D}/ffn/project_out/Conv_0/kernel", t_conv),
            (rf"{S}\.ffn\.project_out\.bias",
             rf"{D}/ffn/project_out/Conv_0/bias", t_id),
        ]
    for name in ("down1_2", "down2_3", "down3_4", "up4_3", "up3_2", "up2_1"):
        rules.append((rf"{name}\.body\.0\.weight",
                      rf"{name}/conv/Conv_0/kernel", t_conv))
    for name in ("reduce_chan_level3", "reduce_chan_level2"):
        rules.append((rf"{name}\.weight", rf"{name}/Conv_0/kernel", t_conv))
        rules.append((rf"{name}\.bias", rf"{name}/Conv_0/bias", t_id))
    return rules


def convert_with_drops(state: dict, rules: list[Rule], template=None,
                       strict: bool = True, multi: bool = False) -> dict:
    """Like convert_state_dict but rules whose path template is empty
    drop the key (buffers like relative_position_index, attn_mask)."""
    kept_rules = [(p, t, f) for p, t, f in rules if t != ""]
    drop_pats = [p for p, t, f in rules if t == ""]
    filtered = {k: v for k, v in state.items()
                if not any(re.fullmatch(p, k) for p in drop_pats)}
    return convert_state_dict(filtered, kept_rules, template, strict, multi)


def mprnet_rules() -> list[Rule]:
    """Reference MPRNet names (MPRNet.py) -> models/mprnet.py.

    The reference shares one nn.PReLU instance across every CAB
    (MPRNet.py:239 ``act=nn.PReLU()``); torch's state_dict re-emits the
    same (1,)-tensor under each parent (``<cab>.body.1.weight``), so the
    1:1 rule engine maps each occurrence onto our per-block ``act/alpha``
    directly — no fan-out pass needed. bias=False throughout (the
    constructor default all three reference variants use).
    """
    def cab(src: str, dst: str) -> list[Rule]:
        return [
            (rf"{src}\.body\.0\.weight", rf"{dst}/c1/Conv_0/kernel", t_conv),
            (rf"{src}\.body\.1\.weight", rf"{dst}/act/alpha", t_scalar),
            (rf"{src}\.body\.2\.weight", rf"{dst}/c2/Conv_0/kernel", t_conv),
            (rf"{src}\.CA\.conv_du\.0\.weight",
             rf"{dst}/ca/du1/Conv_0/kernel", t_conv),
            (rf"{src}\.CA\.conv_du\.2\.weight",
             rf"{dst}/ca/du2/Conv_0/kernel", t_conv),
        ]

    rules: list[Rule] = []
    # shallow feature stacks: Sequential[conv, CAB]
    for k in (1, 2, 3):
        rules += [(rf"shallow_feat{k}\.0\.weight",
                   rf"shallow_feat{k}_conv/Conv_0/kernel", t_conv)]
        rules += cab(rf"shallow_feat{k}\.1", rf"shallow_feat{k}_cab")
    # stage encoders/decoders
    for st in ("stage1_encoder", "stage2_encoder"):
        for lvl in (0, 1, 2):
            torch_lvl = lvl + 1
            rules += cab(rf"{st}\.encoder_level{torch_lvl}\.(\d+)",
                         rf"{st}/enc{lvl}_cab\1")
            rules += [
                (rf"{st}\.csff_enc{torch_lvl}\.weight",
                 rf"{st}/csff_enc{lvl}/Conv_0/kernel", t_conv),
                (rf"{st}\.csff_dec{torch_lvl}\.weight",
                 rf"{st}/csff_dec{lvl}/Conv_0/kernel", t_conv),
            ]
        rules += [
            (rf"{st}\.down12\.down\.1\.weight",
             rf"{st}/down0/conv/Conv_0/kernel", t_conv),
            (rf"{st}\.down23\.down\.1\.weight",
             rf"{st}/down1/conv/Conv_0/kernel", t_conv),
        ]
    for st in ("stage1_decoder", "stage2_decoder"):
        for lvl, ours in ((1, 0), (2, 1), (3, 2)):
            rules += cab(rf"{st}\.decoder_level{lvl}\.(\d+)",
                         rf"{st}/dec{ours}_cab\1")
        rules += cab(rf"{st}\.skip_attn1", rf"{st}/skip_attn1")
        rules += cab(rf"{st}\.skip_attn2", rf"{st}/skip_attn2")
        rules += [
            (rf"{st}\.up21\.up\.1\.weight",
             rf"{st}/up21/conv/Conv_0/kernel", t_conv),
            (rf"{st}\.up32\.up\.1\.weight",
             rf"{st}/up32/conv/Conv_0/kernel", t_conv),
        ]
    # SAMs and concats/tail
    for sam in ("sam12", "sam23"):
        for i in (1, 2, 3):
            rules.append((rf"{sam}\.conv{i}\.weight",
                          rf"{sam}/conv{i}/Conv_0/kernel", t_conv))
    rules += [
        (r"concat12\.weight", r"concat12/Conv_0/kernel", t_conv),
        (r"concat23\.weight", r"concat23/Conv_0/kernel", t_conv),
        (r"tail\.weight", r"tail/Conv_0/kernel", t_conv),
    ]
    # ORSNet
    orb = r"stage3_orsnet\.orb(\d)"
    rules += cab(rf"{orb}\.body\.(\d+)", r"stage3_orsnet/orb\1_cab\2")
    rules += [
        (rf"{orb}\.body\.(\d+)\.weight",
         r"stage3_orsnet/orb\1_conv/Conv_0/kernel", t_conv),
    ]
    for name in ("conv_enc1", "conv_enc2", "conv_enc3", "conv_dec1",
                 "conv_dec2", "conv_dec3"):
        rules.append((rf"stage3_orsnet\.{name}\.weight",
                      rf"stage3_orsnet/{name}/Conv_0/kernel", t_conv))
    for t_name, ours in (("up_enc1", "up_enc1"), ("up_dec1", "up_dec1")):
        rules.append((rf"stage3_orsnet\.{t_name}\.up\.1\.weight",
                      rf"stage3_orsnet/{ours}/conv/Conv_0/kernel", t_conv))
    for t_name, a, b in (("up_enc2", "up_enc2a", "up_enc2b"),
                         ("up_dec2", "up_dec2a", "up_dec2b")):
        rules += [
            (rf"stage3_orsnet\.{t_name}\.0\.up\.1\.weight",
             rf"stage3_orsnet/{a}/conv/Conv_0/kernel", t_conv),
            (rf"stage3_orsnet\.{t_name}\.1\.up\.1\.weight",
             rf"stage3_orsnet/{b}/conv/Conv_0/kernel", t_conv),
        ]
    return rules


def dehazeformer_rules() -> list[Rule]:
    """Reference DehazeFormer names (models/dehazeformer.py) ->
    models/dehazeformer.py here.

    torch layer1..5 are our layer0..4; RLN affine (1,C,1,1) tensors
    flatten to (C,); the window-attention CPB MLP (``attn.attn.meta``)
    maps to meta_fc1/meta_fc2 Linears; ``relative_positions`` buffers are
    recomputed, not converted.
    """
    rules: list[Rule] = []
    rules += [
        (r"patch_embed\.proj\.weight", r"patch_embed/Conv_0/kernel", t_conv),
        (r"patch_embed\.proj\.bias", r"patch_embed/Conv_0/bias", t_id),
        (r"patch_unembed\.proj\.0\.weight", r"patch_unembed/Conv_0/kernel",
         t_conv),
        (r"patch_unembed\.proj\.0\.bias", r"patch_unembed/Conv_0/bias", t_id),
    ]
    for k in (1, 2):
        rules += [
            (rf"patch_merge{k}\.proj\.weight",
             rf"patch_merge{k}/Conv_0/kernel", t_conv),
            (rf"patch_merge{k}\.proj\.bias",
             rf"patch_merge{k}/Conv_0/bias", t_id),
            (rf"patch_split{k}\.proj\.0\.weight",
             rf"patch_split{k}/Conv_0/kernel", t_conv),
            (rf"patch_split{k}\.proj\.0\.bias",
             rf"patch_split{k}/Conv_0/bias", t_id),
            (rf"skip{k}\.weight", rf"skip{k}/Conv_0/kernel", t_conv),
            (rf"skip{k}\.bias", rf"skip{k}/Conv_0/bias", t_id),
            (rf"fusion{k}\.mlp\.0\.weight",
             rf"fusion{k}/mlp1/Conv_0/kernel", t_conv),
            (rf"fusion{k}\.mlp\.2\.weight",
             rf"fusion{k}/mlp2/Conv_0/kernel", t_conv),
        ]
    for tl in (1, 2, 3, 4, 5):
        S = rf"layer{tl}\.blocks\.(\d+)"
        D = rf"layer{tl - 1}_blk\1"
        rules += [
            (rf"{S}\.attn\.conv\.weight", rf"{D}/attn/conv/Conv_0/kernel",
             t_dwconv),
            (rf"{S}\.attn\.conv\.bias", rf"{D}/attn/conv/Conv_0/bias", t_id),
            (rf"{S}\.attn\.V\.weight", rf"{D}/attn/V/Conv_0/kernel", t_conv),
            (rf"{S}\.attn\.V\.bias", rf"{D}/attn/V/Conv_0/bias", t_id),
            (rf"{S}\.attn\.QK\.weight", rf"{D}/attn/QK/Conv_0/kernel",
             t_conv),
            (rf"{S}\.attn\.QK\.bias", rf"{D}/attn/QK/Conv_0/bias", t_id),
            (rf"{S}\.attn\.proj\.weight", rf"{D}/attn/proj/Conv_0/kernel",
             t_conv),
            (rf"{S}\.attn\.proj\.bias", rf"{D}/attn/proj/Conv_0/bias", t_id),
            (rf"{S}\.attn\.attn\.meta\.0\.weight",
             rf"{D}/attn/attn/meta_fc1/kernel", t_linear),
            (rf"{S}\.attn\.attn\.meta\.0\.bias",
             rf"{D}/attn/attn/meta_fc1/bias", t_id),
            (rf"{S}\.attn\.attn\.meta\.2\.weight",
             rf"{D}/attn/attn/meta_fc2/kernel", t_linear),
            (rf"{S}\.attn\.attn\.meta\.2\.bias",
             rf"{D}/attn/attn/meta_fc2/bias", t_id),
            (rf"{S}\.attn\.attn\.relative_positions", "", t_id),
            (rf"{S}\.mlp\.mlp\.0\.weight", rf"{D}/mlp_fc1/Conv_0/kernel",
             t_conv),
            (rf"{S}\.mlp\.mlp\.0\.bias", rf"{D}/mlp_fc1/Conv_0/bias", t_id),
            (rf"{S}\.mlp\.mlp\.2\.weight", rf"{D}/mlp_fc2/Conv_0/kernel",
             t_conv),
            (rf"{S}\.mlp\.mlp\.2\.bias", rf"{D}/mlp_fc2/Conv_0/bias", t_id),
        ]
        for nrm in ("norm1", "norm2"):
            rules += [
                (rf"{S}\.{nrm}\.weight", rf"{D}/{nrm}/weight", t_squeeze),
                (rf"{S}\.{nrm}\.bias", rf"{D}/{nrm}/bias", t_squeeze),
                (rf"{S}\.{nrm}\.meta1\.weight",
                 rf"{D}/{nrm}/meta1/Conv_0/kernel", t_conv),
                (rf"{S}\.{nrm}\.meta1\.bias",
                 rf"{D}/{nrm}/meta1/Conv_0/bias", t_id),
                (rf"{S}\.{nrm}\.meta2\.weight",
                 rf"{D}/{nrm}/meta2/Conv_0/kernel", t_conv),
                (rf"{S}\.{nrm}\.meta2\.bias",
                 rf"{D}/{nrm}/meta2/Conv_0/bias", t_id),
            ]
    return rules


def drbnet_rules() -> list[Rule]:
    """Reference DRBNet_single names (models/DRBNet.py) -> models/drbnet.py.

    Encoder convs are Sequential(conv, lrelu) (`.0.weight`); ResnetBlocks
    expose `stem.0.{0,2}`; the FAC kernel heads end in a bare 1x1 conv
    (`.2.weight`), the res heads in Sequential(conv, lrelu) (`.2.0`).
    torch upconv{3,2,1,0}_* heads are our up{8,4,2,1}_* (named by scale).
    """
    rules: list[Rule] = []
    for i in (1, 2, 3, 4):
        for j in (1, 2, 3):
            rules += [
                (rf"conv{i}_{j}\.0\.weight",
                 rf"conv{i}_{j}/Conv_0/kernel", t_conv),
                (rf"conv{i}_{j}\.0\.bias", rf"conv{i}_{j}/Conv_0/bias", t_id),
            ]

    def res_block(src: str, dst: str) -> list[Rule]:
        return [
            (rf"{src}\.stem\.0\.0\.weight", rf"{dst}/c1/Conv_0/kernel",
             t_conv),
            (rf"{src}\.stem\.0\.0\.bias", rf"{dst}/c1/Conv_0/bias", t_id),
            (rf"{src}\.stem\.0\.2\.weight", rf"{dst}/c2/Conv_0/kernel",
             t_conv),
            (rf"{src}\.stem\.0\.2\.bias", rf"{dst}/c2/Conv_0/bias", t_id),
        ]

    rules += [
        (r"conv4_4\.0\.0\.weight", r"conv4_4_pre/c0/Conv_0/kernel", t_conv),
        (r"conv4_4\.0\.0\.bias", r"conv4_4_pre/c0/Conv_0/bias", t_id),
        (r"conv4_4\.3\.0\.weight", r"conv4_4_post/c0/Conv_0/kernel", t_conv),
        (r"conv4_4\.3\.0\.bias", r"conv4_4_post/c0/Conv_0/bias", t_id),
    ]
    rules += res_block(r"conv4_4\.1", r"conv4_4_r1")
    rules += res_block(r"conv4_4\.2", r"conv4_4_r2")

    for lvl in (1, 2, 3):
        rules += [
            (rf"upconv{lvl}_u\.0\.weight", rf"upconv{lvl}_u/t/kernel",
             t_convT),
            (rf"upconv{lvl}_u\.0\.bias", rf"upconv{lvl}_u/t/bias", t_id),
        ]
        rules += res_block(rf"upconv{lvl}_1", rf"upconv{lvl}_r1")
        rules += res_block(rf"upconv{lvl}_2", rf"upconv{lvl}_r2")

    for tlvl, scale in ((3, 8), (2, 4), (1, 2), (0, 1)):
        for i in (0, 1):
            rules += [
                (rf"upconv{tlvl}_kernel\.{i}\.0\.weight",
                 rf"up{scale}_kernel/c{i}/Conv_0/kernel", t_conv),
                (rf"upconv{tlvl}_kernel\.{i}\.0\.bias",
                 rf"up{scale}_kernel/c{i}/Conv_0/bias", t_id),
                (rf"upconv{tlvl}_res\.{i}\.0\.weight",
                 rf"up{scale}_res/c{i}/Conv_0/kernel", t_conv),
                (rf"upconv{tlvl}_res\.{i}\.0\.bias",
                 rf"up{scale}_res/c{i}/Conv_0/bias", t_id),
            ]
        rules += [
            (rf"upconv{tlvl}_kernel\.2\.weight",
             rf"up{scale}_kernel/c2/Conv_0/kernel", t_conv),
            (rf"upconv{tlvl}_kernel\.2\.bias",
             rf"up{scale}_kernel/c2/Conv_0/bias", t_id),
            (rf"upconv{tlvl}_res\.2\.0\.weight",
             rf"up{scale}_res/c2/Conv_0/kernel", t_conv),
            (rf"upconv{tlvl}_res\.2\.0\.bias",
             rf"up{scale}_res/c2/Conv_0/bias", t_id),
        ]
    for d, scale in (("d8", 8), ("d4", 4), ("d2", 2), ("d1", 1)):
        for i in (0, 1, 2):
            rules += [
                (rf"img_{d}_feature\.{i}\.0\.weight",
                 rf"img_{d}_feature/c{i}/Conv_0/kernel", t_conv),
                (rf"img_{d}_feature\.{i}\.0\.bias",
                 rf"img_{d}_feature/c{i}/Conv_0/bias", t_id),
            ]
    return rules


def hat_rules() -> list[Rule]:
    """Reference HAT names (hat_arch.py) -> models/hat.py.

    MUST be applied with ``multi=True``: each block's torch norm1 fans out
    to two flax leaves — the fused attention half-block's internal LN
    (``attn/norm_scale``) and the CAB branch's copy (``norm1/scale``) —
    because the reference applies one norm1 to both branches while our
    attention path uses SwinIR's fused pre-norm layer.
    """
    L = r"layers\.(\d+)\.residual_group\.blocks\.(\d+)"
    D = r"layer\1/hab\2"
    rules: list[Rule] = [
        (r"conv_first\.weight", r"conv_first/Conv_0/kernel", t_conv),
        (r"conv_first\.bias", r"conv_first/Conv_0/bias", t_id),
        (r"patch_embed\.norm\.weight", r"patch_embed_norm/scale", t_id),
        (r"patch_embed\.norm\.bias", r"patch_embed_norm/bias", t_id),
        (r"norm\.weight", r"norm/scale", t_id),
        (r"norm\.bias", r"norm/bias", t_id),
        (r"conv_after_body\.weight", r"conv_after_body/Conv_0/kernel",
         t_conv),
        (r"conv_after_body\.bias", r"conv_after_body/Conv_0/bias", t_id),
        (r"conv_before_upsample\.0\.weight",
         r"conv_before_upsample/Conv_0/kernel", t_conv),
        (r"conv_before_upsample\.0\.bias",
         r"conv_before_upsample/Conv_0/bias", t_id),
        (r"upsample\.0\.weight", r"upsample0/Conv_0/kernel", t_conv),
        (r"upsample\.0\.bias", r"upsample0/Conv_0/bias", t_id),
        (r"upsample\.2\.weight", r"upsample1/Conv_0/kernel", t_conv),
        (r"upsample\.2\.bias", r"upsample1/Conv_0/bias", t_id),
        (r"conv_last\.weight", r"conv_last/Conv_0/kernel", t_conv),
        (r"conv_last\.bias", r"conv_last/Conv_0/bias", t_id),
        (r"relative_position_index_SA", "", t_id),
        (r"relative_position_index_OCA", "", t_id),
        (rf"{L}\.attn_mask", "", t_id),
    ]
    # HAB blocks: norm1 fans out to the fused-LN and the CAB-branch copy
    rules += [
        (rf"{L}\.norm1\.weight", rf"{D}/attn/norm_scale", t_id),
        (rf"{L}\.norm1\.weight", rf"{D}/norm1/scale", t_id),
        (rf"{L}\.norm1\.bias", rf"{D}/attn/norm_bias", t_id),
        (rf"{L}\.norm1\.bias", rf"{D}/norm1/bias", t_id),
        (rf"{L}\.attn\.relative_position_bias_table",
         rf"{D}/attn/relative_position_bias_table", t_id),
        (rf"{L}\.attn\.qkv\.weight", rf"{D}/attn/qkv_kernel", t_linear),
        (rf"{L}\.attn\.qkv\.bias", rf"{D}/attn/qkv_bias_p", t_id),
        (rf"{L}\.attn\.proj\.weight", rf"{D}/attn/proj_kernel", t_linear),
        (rf"{L}\.attn\.proj\.bias", rf"{D}/attn/proj_bias_p", t_id),
        (rf"{L}\.conv_block\.cab\.0\.weight",
         rf"{D}/conv_block/c1/Conv_0/kernel", t_conv),
        (rf"{L}\.conv_block\.cab\.0\.bias",
         rf"{D}/conv_block/c1/Conv_0/bias", t_id),
        (rf"{L}\.conv_block\.cab\.2\.weight",
         rf"{D}/conv_block/c2/Conv_0/kernel", t_conv),
        (rf"{L}\.conv_block\.cab\.2\.bias",
         rf"{D}/conv_block/c2/Conv_0/bias", t_id),
        (rf"{L}\.conv_block\.cab\.3\.attention\.1\.weight",
         rf"{D}/conv_block/ca1/Conv_0/kernel", t_conv),
        (rf"{L}\.conv_block\.cab\.3\.attention\.1\.bias",
         rf"{D}/conv_block/ca1/Conv_0/bias", t_id),
        (rf"{L}\.conv_block\.cab\.3\.attention\.3\.weight",
         rf"{D}/conv_block/ca2/Conv_0/kernel", t_conv),
        (rf"{L}\.conv_block\.cab\.3\.attention\.3\.bias",
         rf"{D}/conv_block/ca2/Conv_0/bias", t_id),
        (rf"{L}\.norm2\.weight", rf"{D}/norm2/scale", t_id),
        (rf"{L}\.norm2\.bias", rf"{D}/norm2/bias", t_id),
        (rf"{L}\.mlp\.fc1\.weight", rf"{D}/fc1/kernel", t_linear),
        (rf"{L}\.mlp\.fc1\.bias", rf"{D}/fc1/bias", t_id),
        (rf"{L}\.mlp\.fc2\.weight", rf"{D}/fc2/kernel", t_linear),
        (rf"{L}\.mlp\.fc2\.bias", rf"{D}/fc2/bias", t_id),
    ]
    O = r"layers\.(\d+)\.residual_group\.overlap_attn"
    DO = r"layer\1/ocab"
    rules += [
        (rf"{O}\.relative_position_bias_table",
         rf"{DO}/relative_position_bias_table", t_id),
        (rf"{O}\.norm1\.weight", rf"{DO}/norm1/scale", t_id),
        (rf"{O}\.norm1\.bias", rf"{DO}/norm1/bias", t_id),
        (rf"{O}\.qkv\.weight", rf"{DO}/qkv/kernel", t_linear),
        (rf"{O}\.qkv\.bias", rf"{DO}/qkv/bias", t_id),
        (rf"{O}\.proj\.weight", rf"{DO}/proj/kernel", t_linear),
        (rf"{O}\.proj\.bias", rf"{DO}/proj/bias", t_id),
        (rf"{O}\.norm2\.weight", rf"{DO}/norm2/scale", t_id),
        (rf"{O}\.norm2\.bias", rf"{DO}/norm2/bias", t_id),
        (rf"{O}\.mlp\.fc1\.weight", rf"{DO}/fc1/kernel", t_linear),
        (rf"{O}\.mlp\.fc1\.bias", rf"{DO}/fc1/bias", t_id),
        (rf"{O}\.mlp\.fc2\.weight", rf"{DO}/fc2/kernel", t_linear),
        (rf"{O}\.mlp\.fc2\.bias", rf"{DO}/fc2/bias", t_id),
        (r"layers\.(\d+)\.conv\.weight", r"layer\1/conv/Conv_0/kernel",
         t_conv),
        (r"layers\.(\d+)\.conv\.bias", r"layer\1/conv/Conv_0/bias", t_id),
    ]
    return rules


def xrestormer_rules() -> list[Rule]:
    """Reference X-Restormer names (xrestormer_arch.py) -> models/
    xrestormer.py.

    Per TransformerBlock: 4 LayerNorms (.body), channel_attn (MDTA, same
    layout as Restormer's attn incl. (heads,1,1) temperature), two GDFN
    ffns, and the OCAB spatial attention whose RelPosEmb tables
    (rel_height/rel_width, (2*owin-1, dim_head)) copy verbatim.
    """
    stages = ("encoder_level1", "encoder_level2", "encoder_level3",
              "latent", "decoder_level3", "decoder_level2",
              "decoder_level1", "refinement")
    rules: list[Rule] = [
        (r"patch_embed\.proj\.weight", r"patch_embed/Conv_0/kernel", t_conv),
        (r"patch_embed\.proj\.bias", r"patch_embed/Conv_0/bias", t_id),
        (r"output\.weight", r"output/Conv_0/kernel", t_conv),
        (r"output\.bias", r"output/Conv_0/bias", t_id),
    ]
    for st in stages:
        S = rf"{st}\.(\d+)"
        D = rf"{st}_\1"
        for k in range(1, 5):
            rules += [
                (rf"{S}\.norm{k}\.body\.weight", rf"{D}/norm{k}/weight",
                 t_id),
                (rf"{S}\.norm{k}\.body\.bias", rf"{D}/norm{k}/bias", t_id),
            ]
        rules += [
            (rf"{S}\.channel_attn\.temperature",
             rf"{D}/channel_attn/temperature", t_squeeze),
        ]
        for conv, tr in (("qkv", t_conv), ("qkv_dwconv", t_dwconv),
                         ("project_out", t_conv)):
            rules += [
                (rf"{S}\.channel_attn\.{conv}\.weight",
                 rf"{D}/channel_attn/{conv}/Conv_0/kernel", tr),
                (rf"{S}\.channel_attn\.{conv}\.bias",
                 rf"{D}/channel_attn/{conv}/Conv_0/bias", t_id),
            ]
        for ffn in ("channel_ffn", "spatial_ffn"):
            for conv, tr in (("project_in", t_conv), ("dwconv", t_dwconv),
                             ("project_out", t_conv)):
                rules += [
                    (rf"{S}\.{ffn}\.{conv}\.weight",
                     rf"{D}/{ffn}/{conv}/Conv_0/kernel", tr),
                    (rf"{S}\.{ffn}\.{conv}\.bias",
                     rf"{D}/{ffn}/{conv}/Conv_0/bias", t_id),
                ]
        rules += [
            (rf"{S}\.spatial_attn\.qkv\.weight",
             rf"{D}/spatial_attn/qkv/Conv_0/kernel", t_conv),
            (rf"{S}\.spatial_attn\.qkv\.bias",
             rf"{D}/spatial_attn/qkv/Conv_0/bias", t_id),
            (rf"{S}\.spatial_attn\.project_out\.weight",
             rf"{D}/spatial_attn/project_out/Conv_0/kernel", t_conv),
            (rf"{S}\.spatial_attn\.project_out\.bias",
             rf"{D}/spatial_attn/project_out/Conv_0/bias", t_id),
            (rf"{S}\.spatial_attn\.rel_pos_emb\.rel_height",
             rf"{D}/spatial_attn/rel_height", t_id),
            (rf"{S}\.spatial_attn\.rel_pos_emb\.rel_width",
             rf"{D}/spatial_attn/rel_width", t_id),
        ]
    for name in ("down1_2", "down2_3", "down3_4", "up4_3", "up3_2", "up2_1"):
        rules.append((rf"{name}\.body\.0\.weight",
                      rf"{name}/conv/Conv_0/kernel", t_conv))
    for name in ("reduce_chan_level3", "reduce_chan_level2"):
        rules.append((rf"{name}\.weight", rf"{name}/Conv_0/kernel", t_conv))
        rules.append((rf"{name}\.bias", rf"{name}/Conv_0/bias", t_id))
    return rules


def _resblock_rules(src: str, dst: str) -> list[Rule]:
    """RIDCP pre-act GN ResBlock (ridcp_utils.py:65-85): Sequential
    [NormLayer, Act, Conv, NormLayer, Act, Conv] under .conv."""
    return [
        (rf"{src}\.conv\.0\.norm\.weight", rf"{dst}/gn1/scale", t_id),
        (rf"{src}\.conv\.0\.norm\.bias", rf"{dst}/gn1/bias", t_id),
        (rf"{src}\.conv\.2\.weight", rf"{dst}/c1/Conv_0/kernel", t_conv),
        (rf"{src}\.conv\.2\.bias", rf"{dst}/c1/Conv_0/bias", t_id),
        (rf"{src}\.conv\.3\.norm\.weight", rf"{dst}/gn2/scale", t_id),
        (rf"{src}\.conv\.3\.norm\.bias", rf"{dst}/gn2/bias", t_id),
        (rf"{src}\.conv\.5\.weight", rf"{dst}/c2/Conv_0/kernel", t_conv),
        (rf"{src}\.conv\.5\.bias", rf"{dst}/c2/Conv_0/bias", t_id),
    ]


def _rstb_rules(src: str, dst: str) -> list[Rule]:
    """network_swinir RSTB internals -> models/swinir.RSTB (same leaf map
    as swinir_rules' per-block section)."""
    L = rf"{src}\.residual_group\.blocks\.(\d+)"
    D = rf"{dst}/block\1"
    rules: list[Rule] = [
        (rf"{L}\.norm1\.weight", rf"{D}/attn/norm_scale", t_id),
        (rf"{L}\.norm1\.bias", rf"{D}/attn/norm_bias", t_id),
        (rf"{L}\.norm2\.weight", rf"{D}/norm2_scale", t_id),
        (rf"{L}\.norm2\.bias", rf"{D}/norm2_bias", t_id),
        (rf"{L}\.attn\.relative_position_bias_table",
         rf"{D}/attn/relative_position_bias_table", t_id),
        (rf"{L}\.attn\.qkv\.weight", rf"{D}/attn/qkv_kernel", t_linear),
        (rf"{L}\.attn\.qkv\.bias", rf"{D}/attn/qkv_bias_p", t_id),
        (rf"{L}\.attn\.proj\.weight", rf"{D}/attn/proj_kernel", t_linear),
        (rf"{L}\.attn\.proj\.bias", rf"{D}/attn/proj_bias_p", t_id),
        (rf"{L}\.mlp\.fc1\.weight", rf"{D}/fc1_kernel", t_linear),
        (rf"{L}\.mlp\.fc1\.bias", rf"{D}/fc1_bias", t_id),
        (rf"{L}\.mlp\.fc2\.weight", rf"{D}/fc2_kernel", t_linear),
        (rf"{L}\.mlp\.fc2\.bias", rf"{D}/fc2_bias", t_id),
        (rf"{L}\.attn\.relative_position_index", "", _drop),
        (rf"{L}\.attn_mask", "", _drop),
        (rf"{src}\.conv\.weight", rf"{dst}/conv/Conv_0/kernel", t_conv),
        (rf"{src}\.conv\.bias", rf"{dst}/conv/Conv_0/bias", t_id),
    ]
    return rules


def ridcp_rules(max_depth: int = 2, swin_blocks: int = 4) -> list[Rule]:
    """Reference RIDCP names (dehaze_vq_weight_arch.py, single-scale
    codebook VQWeightDehazeNet) -> models/ridcp.py."""
    rules: list[Rule] = [
        (r"multiscale_encoder\.in_conv\.weight", r"in_conv/kernel", t_conv),
        (r"multiscale_encoder\.in_conv\.bias", r"in_conv/bias", t_id),
        (r"before_quant_group\.0\.weight", r"before_quant/Conv_0/kernel",
         t_conv),
        (r"before_quant_group\.0\.bias", r"before_quant/Conv_0/bias", t_id),
        (r"quantize_group\.0\.embedding\.weight", r"quantize/codebook",
         t_id),
        (r"quantize_group\.0\.weight", r"quantize/hq_weight", t_id),
        (r"after_quant_group\.0\.conv\.weight", r"after_quant/Conv_0/kernel",
         t_conv),
        (r"after_quant_group\.0\.conv\.bias", r"after_quant/Conv_0/bias",
         t_id),
        (r"out_conv\.weight", r"out_conv/Conv_0/kernel", t_conv),
        (r"out_conv\.bias", r"out_conv/Conv_0/bias", t_id),
        (r"residual_conv\.weight", r"residual_conv/Conv_0/kernel", t_conv),
        (r"residual_conv\.bias", r"residual_conv/Conv_0/bias", t_id),
    ]
    for i in range(max_depth):
        enc = rf"multiscale_encoder\.blocks\.{i}"
        rules += [
            (rf"{enc}\.0\.weight", rf"enc{i}_down/Conv_0/kernel", t_conv),
            (rf"{enc}\.0\.bias", rf"enc{i}_down/Conv_0/bias", t_id),
        ]
        rules += _resblock_rules(rf"{enc}\.1", rf"enc{i}_res0")
        rules += _resblock_rules(rf"{enc}\.2", rf"enc{i}_res1")

        dec = rf"decoder_group\.{i}\.block"
        rules += [
            (rf"{dec}\.1\.weight", rf"dec{i}_conv/Conv_0/kernel", t_conv),
            (rf"{dec}\.1\.bias", rf"dec{i}_conv/Conv_0/bias", t_id),
        ]
        rules += _resblock_rules(rf"{dec}\.2", rf"dec{i}_res0")
        rules += _resblock_rules(rf"{dec}\.3", rf"dec{i}_res1")

        up = rf"multiscale_decoder\.upsampler\.{i}"
        rules += [
            (rf"{up}\.1\.weight", rf"resid{i}_conv/Conv_0/kernel", t_conv),
            (rf"{up}\.1\.bias", rf"resid{i}_conv/Conv_0/bias", t_id),
        ]
        rules += _resblock_rules(rf"{up}\.2", rf"resid{i}_res0")
        rules += _resblock_rules(rf"{up}\.3", rf"resid{i}_res1")

        warp = rf"multiscale_decoder\.warp\.{i}"
        rules += [
            (rf"{warp}\.offset\.weight", rf"warp{i}/offset_feat/Conv_0/kernel",
             t_conv),
            (rf"{warp}\.offset\.bias", rf"warp{i}/offset_feat/Conv_0/bias",
             t_id),
            (rf"{warp}\.dcn\.conv_offset\.weight",
             rf"warp{i}/conv_offset/Conv_0/kernel", t_conv),
            (rf"{warp}\.dcn\.conv_offset\.bias",
             rf"warp{i}/conv_offset/Conv_0/bias", t_id),
            (rf"{warp}\.dcn\.weight", rf"warp{i}/dcn_kernel", t_conv),
            (rf"{warp}\.dcn\.bias", rf"warp{i}/dcn_bias", t_id),
        ]
    for i in range(swin_blocks):
        rules += _rstb_rules(
            rf"multiscale_encoder\.blocks\.{max_depth}\.swin_blks\.{i}",
            rf"enc_swin{i}")
    return rules


def ifan_rules(res_num: int = 2) -> list[Rule]:
    """Reference IFAN names (models/archs/IFAN.py + nn_common.py) ->
    models/ifan.py.

    Encoder convs are Sequential(conv, lrelu) (`.0.weight`); ResnetBlocks
    expose `stem.{i}.{0,2}` per inner iteration; the Sequential heads DME /
    conv4_4 / F / conv_res index their members, with act=None tails as bare
    convs (`DME.3.weight`, `F.3.weight`); `upconv{l}_u.0` is a
    ConvTranspose2d; `out_res.0` is conv+lrelu.
    """
    rules: list[Rule] = [
        # encoder stages conv1_1..conv4_3 and kconv1_1..kconv4_3
        (r"(k?conv[1-4])_([123])\.0\.weight", r"\1_\2/Conv_0/kernel",
         t_conv),
        (r"(k?conv[1-4])_([123])\.0\.bias", r"\1_\2/Conv_0/bias", t_id),
    ]

    def res_block(src: str, dst: str, n: int) -> list[Rule]:
        out: list[Rule] = []
        for i in range(n):
            out += [
                (rf"{src}\.stem\.{i}\.0\.weight",
                 rf"{dst}/stem{i}_a/Conv_0/kernel", t_conv),
                (rf"{src}\.stem\.{i}\.0\.bias",
                 rf"{dst}/stem{i}_a/Conv_0/bias", t_id),
                (rf"{src}\.stem\.{i}\.2\.weight",
                 rf"{dst}/stem{i}_b/Conv_0/kernel", t_conv),
                (rf"{src}\.stem\.{i}\.2\.bias",
                 rf"{dst}/stem{i}_b/Conv_0/bias", t_id),
            ]
        return out

    # DME: Sequential(conv+act, res, res, conv-no-act)  (IFAN.py:101-105)
    rules += [
        (r"DME\.0\.0\.weight", r"dme_in/Conv_0/kernel", t_conv),
        (r"DME\.0\.0\.bias", r"dme_in/Conv_0/bias", t_id),
        (r"DME\.3\.weight", r"dme_out/Conv_0/kernel", t_conv),
        (r"DME\.3\.bias", r"dme_out/Conv_0/bias", t_id),
    ]
    rules += res_block(r"DME\.1", "dme_res1", res_num)
    rules += res_block(r"DME\.2", "dme_res2", res_num)
    rules += [
        (r"conv_DME\.0\.weight", r"conv_dme/Conv_0/kernel", t_conv),
        (r"conv_DME\.0\.bias", r"conv_dme/Conv_0/bias", t_id),
    ]
    # conv4_4: Sequential(conv+act, res, res, conv+act)  (IFAN.py:52-56)
    rules += [
        (r"conv4_4\.0\.0\.weight", r"conv4_4_in/Conv_0/kernel", t_conv),
        (r"conv4_4\.0\.0\.bias", r"conv4_4_in/Conv_0/bias", t_id),
        (r"conv4_4\.3\.0\.weight", r"conv4_4_out/Conv_0/kernel", t_conv),
        (r"conv4_4\.3\.0\.bias", r"conv4_4_out/Conv_0/bias", t_id),
    ]
    rules += res_block(r"conv4_4\.1", "conv4_4_res1", res_num)
    rules += res_block(r"conv4_4\.2", "conv4_4_res2", res_num)
    # F: Sequential(conv+act, res, res, conv1x1-no-act)  (IFAN.py:111-115)
    rules += [
        (r"F\.0\.0\.weight", r"F_in/Conv_0/kernel", t_conv),
        (r"F\.0\.0\.bias", r"F_in/Conv_0/bias", t_id),
        (r"F\.3\.weight", r"F_out/Conv_0/kernel", t_conv),
        (r"F\.3\.bias", r"F_out/Conv_0/bias", t_id),
    ]
    rules += res_block(r"F\.1", "F_res1", res_num)
    rules += res_block(r"F\.2", "F_res2", res_num)
    # conv_res: Sequential(conv+act, res(3), conv+act)  (IFAN.py:59-62)
    rules += [
        (r"conv_res\.0\.0\.weight", r"conv_res_in/Conv_0/kernel", t_conv),
        (r"conv_res\.0\.0\.bias", r"conv_res_in/Conv_0/bias", t_id),
        (r"conv_res\.2\.0\.weight", r"conv_res_out/Conv_0/kernel", t_conv),
        (r"conv_res\.2\.0\.bias", r"conv_res_out/Conv_0/bias", t_id),
    ]
    rules += res_block(r"conv_res\.1", "conv_res_mid", 3)
    for lvl in (1, 2, 3):
        rules += [
            (rf"upconv{lvl}_u\.0\.weight", rf"upconv{lvl}_u/t/kernel",
             t_convT),
            (rf"upconv{lvl}_u\.0\.bias", rf"upconv{lvl}_u/t/bias", t_id),
        ]
        rules += res_block(rf"upconv{lvl}_1", f"upconv{lvl}_1", 1)
        rules += res_block(rf"upconv{lvl}_2", f"upconv{lvl}_2", 1)
    rules += [
        (r"out_res\.0\.weight", r"out_res/Conv_0/kernel", t_conv),
        (r"out_res\.0\.bias", r"out_res/Conv_0/bias", t_id),
    ]
    return rules


def lpips_rules() -> list[Rule]:
    """LPIPS v0.1 'alex' checkpoint -> iqa/lpips.py.

    Accepts both naming schemes in the wild: the full-model layout
    (``net.slice{1-5}.{idx}.weight`` — the lpips repo wraps torchvision
    AlexNet keeping the original feature indices) and a bare torchvision
    trunk (``features.{idx}.weight``) merged with the package's
    ``lin{N}.model.1.weight`` heads. ScalingLayer buffers are constants in
    the Flax module and dropped here.
    """
    idx_map = {0: 0, 3: 1, 6: 2, 8: 3, 10: 4}
    rules: list[Rule] = []
    for src, dst in idx_map.items():
        for prefix in (rf"features\.{src}", rf"net\.slice[1-5]\.{src}"):
            rules += [
                (prefix + r"\.weight", rf"net/conv{dst}/kernel", t_conv),
                (prefix + r"\.bias", rf"net/conv{dst}/bias", t_id),
            ]
    rules += [
        (r"lin([0-4])\.model\.1\.weight", r"lin\1", t_squeeze),
        (r"lins\.([0-4])\.model\.1\.weight", r"lin\1", t_squeeze),
        (r"scaling_layer\..*", "", t_id),
    ]
    return rules


def clip_rules() -> list[Rule]:
    """OpenAI CLIP ResNet checkpoint (RN50x4 layout) -> retrieval/clip.py.

    Keys per the published model.py: ``visual.*`` ModifiedResNet (stem
    conv1-3/bn1-3, layer{1-4}.{i} bottlenecks with ``downsample.{0,1}``
    = conv+bn after the anti-alias avgpool, attnpool q/k/v/c_proj),
    ``transformer.resblocks.{i}`` text blocks (fused ``in_proj_weight``),
    ``token_embedding`` / ``positional_embedding`` / ``ln_final`` /
    ``text_projection``. BatchNorm running stats convert into FrozenBN
    mean/var params; ``logit_scale`` and step counters drop.
    """
    def bn(src: str, dst: str) -> list[Rule]:
        return [
            (rf"{src}\.weight", rf"{dst}/scale", t_id),
            (rf"{src}\.bias", rf"{dst}/bias", t_id),
            (rf"{src}\.running_mean", rf"{dst}/mean", t_id),
            (rf"{src}\.running_var", rf"{dst}/var", t_id),
            (rf"{src}\.num_batches_tracked", "", t_id),
        ]

    rules: list[Rule] = []
    for i in (1, 2, 3):
        rules += [(rf"visual\.conv{i}\.weight", rf"visual/conv{i}/kernel",
                   t_conv)]
        rules += bn(rf"visual\.bn{i}", rf"visual/bn{i}")
    rules += [
        (r"visual\.layer(\d)\.(\d+)\.conv([123])\.weight",
         r"visual/layer\1_\2/conv\3/kernel", t_conv),
        (r"visual\.layer(\d)\.(\d+)\.downsample\.0\.weight",
         r"visual/layer\1_\2/down_conv/kernel", t_conv),
    ]
    rules += bn(r"visual\.layer(\d)\.(\d+)\.bn([123])",
                r"visual/layer\1_\2/bn\3")
    rules += bn(r"visual\.layer(\d)\.(\d+)\.downsample\.1",
                r"visual/layer\1_\2/down_bn")
    rules += [(r"visual\.attnpool\.positional_embedding",
               r"visual/attnpool/positional_embedding", t_id)]
    for p in ("q", "k", "v", "c"):
        rules += [
            (rf"visual\.attnpool\.{p}_proj\.weight",
             rf"visual/attnpool/{p}_proj/kernel", t_linear),
            (rf"visual\.attnpool\.{p}_proj\.bias",
             rf"visual/attnpool/{p}_proj/bias", t_id),
        ]
    rules += [
        (r"token_embedding\.weight", r"text/token_embedding", t_id),
        (r"positional_embedding", r"text/positional_embedding", t_id),
        (r"text_projection", r"text/text_projection", t_id),
        (r"ln_final\.weight", r"text/ln_final/scale", t_id),
        (r"ln_final\.bias", r"text/ln_final/bias", t_id),
        (r"logit_scale", "", t_id),
        (r"input_resolution|context_length|vocab_size", "", t_id),
        (r"transformer\.resblocks\.(\d+)\.attn\.in_proj_weight",
         r"text/block\1/in_proj/kernel", t_linear),
        (r"transformer\.resblocks\.(\d+)\.attn\.in_proj_bias",
         r"text/block\1/in_proj/bias", t_id),
        (r"transformer\.resblocks\.(\d+)\.attn\.out_proj\.weight",
         r"text/block\1/out_proj/kernel", t_linear),
        (r"transformer\.resblocks\.(\d+)\.attn\.out_proj\.bias",
         r"text/block\1/out_proj/bias", t_id),
        (r"transformer\.resblocks\.(\d+)\.ln_([12])\.weight",
         r"text/block\1/ln_\2/scale", t_id),
        (r"transformer\.resblocks\.(\d+)\.ln_([12])\.bias",
         r"text/block\1/ln_\2/bias", t_id),
        (r"transformer\.resblocks\.(\d+)\.mlp\.c_(fc|proj)\.weight",
         r"text/block\1/c_\2/kernel", t_linear),
        (r"transformer\.resblocks\.(\d+)\.mlp\.c_(fc|proj)\.bias",
         r"text/block\1/c_\2/bias", t_id),
    ]
    return rules


def combiner_rules() -> list[Rule]:
    """CLIP4CIR trained Combiner (src/combiner.py) -> retrieval/combiner.py.
    The torch ``dynamic_scalar`` Sequential exposes its linears at indices
    0 and 3 (relu/dropout/sigmoid carry no params)."""
    return [
        (r"text_projection_layer\.weight", r"text_projection/kernel",
         t_linear),
        (r"text_projection_layer\.bias", r"text_projection/bias", t_id),
        (r"image_projection_layer\.weight", r"image_projection/kernel",
         t_linear),
        (r"image_projection_layer\.bias", r"image_projection/bias", t_id),
        (r"combiner_layer\.weight", r"combiner_layer/kernel", t_linear),
        (r"combiner_layer\.bias", r"combiner_layer/bias", t_id),
        (r"output_layer\.weight", r"output_layer/kernel", t_linear),
        (r"output_layer\.bias", r"output_layer/bias", t_id),
        (r"dynamic_scalar\.0\.weight", r"ds_hidden/kernel", t_linear),
        (r"dynamic_scalar\.0\.bias", r"ds_hidden/bias", t_id),
        (r"dynamic_scalar\.3\.weight", r"ds_out/kernel", t_linear),
        (r"dynamic_scalar\.3\.bias", r"ds_out/bias", t_id),
        (r"logit_scale", "", t_id),
    ]


def _sd_transformer_rules(src: str, dst: str) -> list[Rule]:
    """SpatialTransformer (SD2.1 linear in/out) under ``src`` -> ``dst``."""
    rules: list[Rule] = [
        (rf"{src}\.norm\.weight", rf"{dst}/norm/scale", t_id),
        (rf"{src}\.norm\.bias", rf"{dst}/norm/bias", t_id),
        (rf"{src}\.proj_in\.weight", rf"{dst}/proj_in/kernel", t_linear),
        (rf"{src}\.proj_in\.bias", rf"{dst}/proj_in/bias", t_id),
        (rf"{src}\.proj_out\.weight", rf"{dst}/proj_out/kernel", t_linear),
        (rf"{src}\.proj_out\.bias", rf"{dst}/proj_out/bias", t_id),
    ]
    tb = rf"{src}\.transformer_blocks\.0"
    db = rf"{dst}/block0"
    for a in ("attn1", "attn2"):
        for p in ("to_q", "to_k", "to_v"):
            rules.append((rf"{tb}\.{a}\.{p}\.weight",
                          rf"{db}/{a}/{p}/kernel", t_linear))
        rules += [
            (rf"{tb}\.{a}\.to_out\.0\.weight", rf"{db}/{a}/to_out/kernel",
             t_linear),
            (rf"{tb}\.{a}\.to_out\.0\.bias", rf"{db}/{a}/to_out/bias",
             t_id),
        ]
    for i in (1, 2, 3):
        rules += [
            (rf"{tb}\.norm{i}\.weight", rf"{db}/norm{i}/scale", t_id),
            (rf"{tb}\.norm{i}\.bias", rf"{db}/norm{i}/bias", t_id),
        ]
    rules += [
        (rf"{tb}\.ff\.net\.0\.proj\.weight", rf"{db}/ff_in/kernel",
         t_linear),
        (rf"{tb}\.ff\.net\.0\.proj\.bias", rf"{db}/ff_in/bias", t_id),
        (rf"{tb}\.ff\.net\.2\.weight", rf"{db}/ff_out/kernel", t_linear),
        (rf"{tb}\.ff\.net\.2\.bias", rf"{db}/ff_out/bias", t_id),
    ]
    return rules


def _sd_resblock_rules(src: str, dst: str) -> list[Rule]:
    return [
        (rf"{src}\.in_layers\.0\.weight", rf"{dst}/in_norm/scale", t_id),
        (rf"{src}\.in_layers\.0\.bias", rf"{dst}/in_norm/bias", t_id),
        (rf"{src}\.in_layers\.2\.weight", rf"{dst}/in_conv/Conv_0/kernel",
         t_conv),
        (rf"{src}\.in_layers\.2\.bias", rf"{dst}/in_conv/Conv_0/bias",
         t_id),
        (rf"{src}\.emb_layers\.1\.weight", rf"{dst}/emb_proj/kernel",
         t_linear),
        (rf"{src}\.emb_layers\.1\.bias", rf"{dst}/emb_proj/bias", t_id),
        (rf"{src}\.out_layers\.0\.weight", rf"{dst}/out_norm/scale", t_id),
        (rf"{src}\.out_layers\.0\.bias", rf"{dst}/out_norm/bias", t_id),
        (rf"{src}\.out_layers\.3\.weight", rf"{dst}/out_conv/Conv_0/kernel",
         t_conv),
        (rf"{src}\.out_layers\.3\.bias", rf"{dst}/out_conv/Conv_0/bias",
         t_id),
        (rf"{src}\.skip_connection\.weight", rf"{dst}/skip/Conv_0/kernel",
         t_conv),
        (rf"{src}\.skip_connection\.bias", rf"{dst}/skip/Conv_0/bias",
         t_id),
    ]


def _sd_unet_core_rules(src: str, dst: str, channel_mult=(1, 2, 4, 4),
                        num_res_blocks: int = 2,
                        attention_levels=(0, 1, 2)) -> list[Rule]:
    """Encoder (input_blocks) + middle of the SD UNet/ControlNet."""
    rules: list[Rule] = [
        (rf"{src}\.time_embed\.0\.weight", rf"{dst}/time_fc1/kernel",
         t_linear),
        (rf"{src}\.time_embed\.0\.bias", rf"{dst}/time_fc1/bias", t_id),
        (rf"{src}\.time_embed\.2\.weight", rf"{dst}/time_fc2/kernel",
         t_linear),
        (rf"{src}\.time_embed\.2\.bias", rf"{dst}/time_fc2/bias", t_id),
        (rf"{src}\.input_blocks\.0\.0\.weight",
         rf"{dst}/in_conv/Conv_0/kernel", t_conv),
        (rf"{src}\.input_blocks\.0\.0\.bias",
         rf"{dst}/in_conv/Conv_0/bias", t_id),
    ]
    idx = 1
    for li in range(len(channel_mult)):
        for bi in range(num_res_blocks):
            rules += _sd_resblock_rules(rf"{src}\.input_blocks\.{idx}\.0",
                                        rf"{dst}/down{li}_res{bi}")
            if li in attention_levels:
                rules += _sd_transformer_rules(
                    rf"{src}\.input_blocks\.{idx}\.1",
                    rf"{dst}/down{li}_attn{bi}")
            idx += 1
        if li < len(channel_mult) - 1:
            rules += [
                (rf"{src}\.input_blocks\.{idx}\.0\.op\.weight",
                 rf"{dst}/down{li}_downsample/kernel", t_conv),
                (rf"{src}\.input_blocks\.{idx}\.0\.op\.bias",
                 rf"{dst}/down{li}_downsample/bias", t_id),
            ]
            idx += 1
    rules += _sd_resblock_rules(rf"{src}\.middle_block\.0",
                                rf"{dst}/mid_res1")
    rules += _sd_transformer_rules(rf"{src}\.middle_block\.1",
                                   rf"{dst}/mid_attn")
    rules += _sd_resblock_rules(rf"{src}\.middle_block\.2",
                                rf"{dst}/mid_res2")
    return rules


def _vae_rules(src: str, dst: str, ch_mult=(1, 2, 4, 4),
               num_res_blocks: int = 2,
               parts=("encoder", "decoder", "quant", "post_quant")
               ) -> list[Rule]:
    """taming AutoencoderKL under ``src`` -> diffbir/vae.py names."""

    def res(sp, dp):
        out = []
        for a, b in (("norm1", "norm1"), ("norm2", "norm2")):
            out += [(rf"{sp}\.{a}\.weight", rf"{dp}/{b}/scale", t_id),
                    (rf"{sp}\.{a}\.bias", rf"{dp}/{b}/bias", t_id)]
        for a in ("conv1", "conv2", "nin_shortcut"):
            out += [(rf"{sp}\.{a}\.weight", rf"{dp}/{a}/Conv_0/kernel",
                     t_conv),
                    (rf"{sp}\.{a}\.bias", rf"{dp}/{a}/Conv_0/bias", t_id)]
        return out

    def attn(sp, dp):
        out = [(rf"{sp}\.norm\.weight", rf"{dp}/norm/scale", t_id),
               (rf"{sp}\.norm\.bias", rf"{dp}/norm/bias", t_id)]
        for a in ("q", "k", "v", "proj_out"):
            out += [(rf"{sp}\.{a}\.weight", rf"{dp}/{a}/Conv_0/kernel",
                     t_conv),
                    (rf"{sp}\.{a}\.bias", rf"{dp}/{a}/Conv_0/bias", t_id)]
        return out

    rules: list[Rule] = []
    for part in parts:
        if part == "quant":
            rules += [(rf"{src}\.quant_conv\.weight",
                       rf"{dst}/quant_conv/Conv_0/kernel", t_conv),
                      (rf"{src}\.quant_conv\.bias",
                       rf"{dst}/quant_conv/Conv_0/bias", t_id)]
            continue
        if part == "post_quant":
            rules += [(rf"{src}\.post_quant_conv\.weight",
                       rf"{dst}/post_quant_conv/Conv_0/kernel", t_conv),
                      (rf"{src}\.post_quant_conv\.bias",
                       rf"{dst}/post_quant_conv/Conv_0/bias", t_id)]
            continue
        sp, dp = rf"{src}\.{part}", rf"{dst}/{part}"
        rules += [
            (rf"{sp}\.conv_in\.weight", rf"{dp}/conv_in/Conv_0/kernel",
             t_conv),
            (rf"{sp}\.conv_in\.bias", rf"{dp}/conv_in/Conv_0/bias", t_id),
            (rf"{sp}\.norm_out\.weight", rf"{dp}/norm_out/scale", t_id),
            (rf"{sp}\.norm_out\.bias", rf"{dp}/norm_out/bias", t_id),
            (rf"{sp}\.conv_out\.weight", rf"{dp}/conv_out/Conv_0/kernel",
             t_conv),
            (rf"{sp}\.conv_out\.bias", rf"{dp}/conv_out/Conv_0/bias", t_id),
        ]
        rules += res(rf"{sp}\.mid\.block_1", rf"{dp}/mid_block1")
        rules += attn(rf"{sp}\.mid\.attn_1", rf"{dp}/mid_attn")
        rules += res(rf"{sp}\.mid\.block_2", rf"{dp}/mid_block2")
        if part == "encoder":
            for i in range(len(ch_mult)):
                for j in range(num_res_blocks):
                    rules += res(rf"{sp}\.down\.{i}\.block\.{j}",
                                 rf"{dp}/down{i}_block{j}")
                rules += [
                    (rf"{sp}\.down\.{i}\.downsample\.conv\.weight",
                     rf"{dp}/down{i}_downsample/kernel", t_conv),
                    (rf"{sp}\.down\.{i}\.downsample\.conv\.bias",
                     rf"{dp}/down{i}_downsample/bias", t_id),
                ]
        else:  # decoder: taming's up[i] is resolution level i (built in
            #    reverse), 3 blocks per level, upsample on levels > 0
            for i in range(len(ch_mult)):
                for j in range(num_res_blocks + 1):
                    rules += res(rf"{sp}\.up\.{i}\.block\.{j}",
                                 rf"{dp}/up{i}_block{j}")
                rules += [
                    (rf"{sp}\.up\.{i}\.upsample\.conv\.weight",
                     rf"{dp}/up{i}_upsample/Conv_0/kernel", t_conv),
                    (rf"{sp}\.up\.{i}\.upsample\.conv\.bias",
                     rf"{dp}/up{i}_upsample/Conv_0/bias", t_id),
                ]
    return rules


def diffbir_rules(channel_mult=(1, 2, 4, 4), num_res_blocks: int = 2,
                  attention_levels=(0, 1, 2)) -> list[Rule]:
    """DiffBIR v1 full checkpoint (general_full_v1.ckpt) ->
    models/diffbir/ pipeline params.

    Covers: model.diffusion_model (SD2.1 UNet incl. output blocks),
    control_model (ControlNet: shared encoder + zero convs),
    first_stage_model (VAE), cond_encoder (the separately-finetuned hint
    encoder, cldm.py:313-323), preprocess_model (stage-1 SwinIR with
    pixel-unshuffle input and nearest+conv head). The OpenCLIP
    cond_stage_model is consumed separately by
    ``extract_empty_context`` and dropped here, as are the LDM schedule
    buffers and EMA shadows.
    """
    L = len(channel_mult)
    um = r"model\.diffusion_model"
    du = r"diffusion_model"
    rules = _sd_unet_core_rules(um, du, channel_mult, num_res_blocks,
                                attention_levels)
    # UNet output blocks
    idx = 0
    for li in reversed(range(L)):
        for bi in range(num_res_blocks + 1):
            rules += _sd_resblock_rules(rf"{um}\.output_blocks\.{idx}\.0",
                                        rf"{du}/up{li}_res{bi}")
            sub = 1
            if li in attention_levels:
                rules += _sd_transformer_rules(
                    rf"{um}\.output_blocks\.{idx}\.1",
                    rf"{du}/up{li}_attn{bi}")
                sub = 2
            if li > 0 and bi == num_res_blocks:
                rules += [
                    (rf"{um}\.output_blocks\.{idx}\.{sub}\.conv\.weight",
                     rf"{du}/up{li}_upsample/Conv_0/kernel", t_conv),
                    (rf"{um}\.output_blocks\.{idx}\.{sub}\.conv\.bias",
                     rf"{du}/up{li}_upsample/Conv_0/bias", t_id),
                ]
            idx += 1
    rules += [
        (rf"{um}\.out\.0\.weight", rf"{du}/out_norm/scale", t_id),
        (rf"{um}\.out\.0\.bias", rf"{du}/out_norm/bias", t_id),
        (rf"{um}\.out\.2\.weight", rf"{du}/out_conv/kernel", t_conv),
        (rf"{um}\.out\.2\.bias", rf"{du}/out_conv/bias", t_id),
    ]

    # ControlNet: same encoder topology + zero convs
    cm, dc = r"control_model", r"control_model"
    rules += _sd_unet_core_rules(cm, dc, channel_mult, num_res_blocks,
                                 attention_levels)
    n_inputs = 1 + L * num_res_blocks + (L - 1)
    for i in range(n_inputs):
        rules += [
            (rf"{cm}\.zero_convs\.{i}\.0\.weight",
             rf"{dc}/zero{i}/conv/kernel", t_conv),
            (rf"{cm}\.zero_convs\.{i}\.0\.bias",
             rf"{dc}/zero{i}/conv/bias", t_id),
        ]
    rules += [
        (rf"{cm}\.middle_block_out\.0\.weight",
         rf"{dc}/zero_mid/conv/kernel", t_conv),
        (rf"{cm}\.middle_block_out\.0\.bias",
         rf"{dc}/zero_mid/conv/bias", t_id),
    ]

    # VAE + the separately-finetuned condition encoder
    rules += _vae_rules(r"first_stage_model", r"first_stage_model")
    rules += _vae_rules(r"cond_encoder", r"cond_encoder",
                        parts=("encoder", "quant"))

    # stage-1 SwinIR: reuse swinir_rules with prefixes (it already covers
    # the Real-SR head's conv_up{1..3}/conv_hr and the unshuffle variant's
    # Sequential conv_first.1)
    pm, dp = r"preprocess_model", r"preprocess_model"
    for pat, tpl, tr in swinir_rules():
        if tpl == "":
            rules.append((rf"{pm}\.{pat}", "", _drop))
        else:
            rules.append((rf"{pm}\.{pat}", rf"{dp}/{tpl}", tr))

    # drops: LDM schedule buffers, EMA shadows, OpenCLIP text stack
    for pat in (r"betas", r"alphas_cumprod.*", r"sqrt_.*", r"log_.*",
                r"posterior_.*", r"lvlb_weights", r"logvar",
                r"model_ema\..*", r"cond_stage_model\..*",
                r"lq_.*", r"scale_factor"):
        rules.append((pat, "", _drop))
    return rules


def extract_empty_context(state: dict, context_length: int = 77,
                          sot: int = 49406, eot: int = 49407,
                          penultimate: bool = True,
                          heads: Optional[int] = None) -> np.ndarray:
    """Compute the OpenCLIP empty-prompt conditioning from a DiffBIR/SD2.1
    checkpoint's own ``cond_stage_model`` weights — no open_clip needed.

    FrozenOpenCLIPEmbedder(layer="penultimate") semantics: token+pos
    embed, run all-but-the-last resblock with a causal mask (exact GELU),
    then ln_final. The empty prompt tokenizes to [SOT, EOT, 0...]. Returns
    the (context_length, width) array that fills the pipeline's
    ``empty_context`` parameter at conversion time.
    """
    p = "cond_stage_model.model."
    tok = np.asarray(state[p + "token_embedding.weight"], np.float32)
    pos = np.asarray(state[p + "positional_embedding"], np.float32)
    width = tok.shape[1]
    heads = heads or max(1, width // 64)  # OpenCLIP ViT-H text: 1024/64=16
    hd = width // heads

    ids = np.zeros(context_length, np.int64)
    ids[0], ids[1] = sot, eot
    x = tok[ids] + pos[:context_length]

    def ln(x, prefix):
        w = np.asarray(state[prefix + ".weight"], np.float32)
        b = np.asarray(state[prefix + ".bias"], np.float32)
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-5) * w + b

    def gelu(x):
        from scipy.special import erf  # exact GELU (open_clip nn.GELU)
        return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))

    n_layers = 0
    while f"{p}transformer.resblocks.{n_layers}.ln_1.weight" in state:
        n_layers += 1
    mask = np.triu(np.full((context_length, context_length), -np.inf), 1)

    for i in range(n_layers - (1 if penultimate else 0)):
        rb = f"{p}transformer.resblocks.{i}"
        y = ln(x, rb + ".ln_1")
        wi = np.asarray(state[rb + ".attn.in_proj_weight"], np.float32)
        bi = np.asarray(state[rb + ".attn.in_proj_bias"], np.float32)
        qkv = y @ wi.T + bi
        q, k, v = np.split(qkv, 3, axis=-1)

        def h(t):
            return t.reshape(context_length, heads, hd).transpose(1, 0, 2)

        lg = h(q) @ h(k).transpose(0, 2, 1) / np.sqrt(hd) + mask[None]
        lg = lg - lg.max(-1, keepdims=True)
        e = np.exp(lg)
        a = e / e.sum(-1, keepdims=True)
        o = (a @ h(v)).transpose(1, 0, 2).reshape(context_length, width)
        wo = np.asarray(state[rb + ".attn.out_proj.weight"], np.float32)
        bo = np.asarray(state[rb + ".attn.out_proj.bias"], np.float32)
        x = x + o @ wo.T + bo

        y = ln(x, rb + ".ln_2")
        w1 = np.asarray(state[rb + ".mlp.c_fc.weight"], np.float32)
        b1 = np.asarray(state[rb + ".mlp.c_fc.bias"], np.float32)
        w2 = np.asarray(state[rb + ".mlp.c_proj.weight"], np.float32)
        b2 = np.asarray(state[rb + ".mlp.c_proj.bias"], np.float32)
        x = x + gelu(y @ w1.T + b1) @ w2.T + b2

    return ln(x, p + "ln_final")

# NR-metric rule sets live in iqa_rules; re-exported here so the manifest
# getattr-based lookup finds every rule factory in one namespace.
from .iqa_rules import maniqa_rules, musiq_rules  # noqa: E402,F401
