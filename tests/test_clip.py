"""CLIP (ResNet variant) Flax port: conversion + forward parity against an
in-test torch implementation of the published architecture — ModifiedResNet
(anti-aliased strides, attention pooling) + causal text transformer with
QuickGELU — using the real checkpoint key names so clip_rules() is pinned.

Reference usage being rebuilt: clip.load + encode_image/encode_text at
AgentApp/utils/util.py:119-180 and CLIP4CIR clip_fine_tune.py:24.
"""

from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    clip_rules, convert_with_drops)
from image_restoration_agent_tpu.retrieval.clip import CLIPModel  # noqa: E402

pytestmark = pytest.mark.slow

# mini config: vision (1,1,1,1) x width 8, embed 16; text w16 l2 h2 v64 c12
V_LAYERS, V_WIDTH, EMBED = (1, 1, 1, 1), 8, 16
T_WIDTH, T_LAYERS, T_HEADS, VOCAB, CTX = 16, 2, 2, 64, 12
RES = 64


class TBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.avgpool = tnn.AvgPool2d(stride) if stride > 1 \
            else tnn.Identity()
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.stride = stride
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(OrderedDict([
                ("-1", tnn.AvgPool2d(stride)),
                ("0", tnn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", tnn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        identity = self.downsample(x) if self.downsample is not None else x
        return tF.relu(out + identity)


class TAttnPool(tnn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = tnn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim)
            / embed_dim ** 0.5)
        self.k_proj = tnn.Linear(embed_dim, embed_dim)
        self.q_proj = tnn.Linear(embed_dim, embed_dim)
        self.v_proj = tnn.Linear(embed_dim, embed_dim)
        self.c_proj = tnn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        b, c, h, w = x.shape
        x = x.flatten(2).permute(0, 2, 1)  # (B, HW, C)
        x = torch.cat([x.mean(1, keepdim=True), x], dim=1)
        x = x + self.positional_embedding[None]
        q = self.q_proj(x[:, :1])
        k, v = self.k_proj(x), self.v_proj(x)
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(b, -1, self.num_heads, hd).permute(0, 2, 1, 3)

        attn = (heads(q) @ heads(k).transpose(-1, -2)) / hd ** 0.5
        out = attn.softmax(-1) @ heads(v)
        out = out.permute(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
        return self.c_proj(out)


class TVisual(tnn.Module):
    def __init__(self, layers, width, output_dim, res):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width // 2, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width // 2)
        self.conv2 = tnn.Conv2d(width // 2, width // 2, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width // 2)
        self.conv3 = tnn.Conv2d(width // 2, width, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width)
        self.avgpool = tnn.AvgPool2d(2)
        inp = width
        for li, n in enumerate(layers):
            planes = width * 2 ** li
            blocks = []
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                blocks.append(TBottleneck(inp, planes, stride))
                inp = planes * 4
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
        heads = width * 32 // 64
        self.attnpool = TAttnPool(res // 32, inp, heads, output_dim)

    def forward(self, x):
        x = tF.relu(self.bn1(self.conv1(x)))
        x = tF.relu(self.bn2(self.conv2(x)))
        x = tF.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return self.attnpool(x)


class TTextBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, h)
        self.ln_1 = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential(OrderedDict([
            ("c_fc", tnn.Linear(d, 4 * d)),
            ("gelu", tnn.Identity()),
            ("c_proj", tnn.Linear(4 * d, d)),
        ]))
        self.ln_2 = tnn.LayerNorm(d)

    def forward(self, x, mask):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False, attn_mask=mask)
        x = x + y
        y = self.ln_2(x)
        y = self.mlp.c_fc(y)
        y = y * torch.sigmoid(1.702 * y)  # QuickGELU
        return x + self.mlp.c_proj(y)


class TCLIP(tnn.Module):
    def __init__(self):
        super().__init__()
        self.visual = TVisual(V_LAYERS, V_WIDTH, EMBED, RES)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [TTextBlock(T_WIDTH, T_HEADS) for _ in range(T_LAYERS)])
        self.token_embedding = tnn.Embedding(VOCAB, T_WIDTH)
        self.positional_embedding = tnn.Parameter(
            torch.randn(CTX, T_WIDTH) * 0.01)
        self.ln_final = tnn.LayerNorm(T_WIDTH)
        self.text_projection = tnn.Parameter(
            torch.randn(T_WIDTH, EMBED) * 0.02)
        self.logit_scale = tnn.Parameter(torch.tensor(1.0))

    def encode_image(self, image):
        return self.visual(image)

    def encode_text(self, text):
        x = self.token_embedding(text) + self.positional_embedding[None]
        t = text.shape[1]
        mask = torch.full((t, t), float("-inf")).triu(1)
        x = x.permute(1, 0, 2)  # seq-first for nn.MultiheadAttention
        for blk in self.transformer.resblocks:
            x = blk(x, mask)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), text.argmax(-1)]
        return x @ self.text_projection


def _flax_model():
    return CLIPModel(embed_dim=EMBED, vision_layers=V_LAYERS,
                     vision_width=V_WIDTH, image_resolution=RES,
                     text_width=T_WIDTH, text_layers=T_LAYERS,
                     text_heads=T_HEADS, vocab_size=VOCAB,
                     context_length=CTX)


def test_clip_conversion_forward_parity():
    torch.manual_seed(0)
    tm = TCLIP().eval()
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    fm = _flax_model()
    img0 = jnp.zeros((1, RES, RES, 3))
    txt0 = jnp.zeros((1, CTX), jnp.int32)
    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), img0, txt0))
    params = convert_with_drops(state, clip_rules(), template=template)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, RES, RES, 3)).astype(np.float32)
    ids = np.zeros((2, CTX), np.int32)
    ids[0, :5] = [VOCAB - 2, 5, 9, 3, VOCAB - 1]
    ids[1, :3] = [VOCAB - 2, 17, VOCAB - 1]

    with torch.no_grad():
        want_i = tm.encode_image(
            torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        want_t = tm.encode_text(torch.from_numpy(ids.astype(np.int64)))
        want_t = want_t.numpy()

    got_i, got_t = fm.apply(params, jnp.asarray(img), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got_i), want_i, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=2e-4)


def test_preprocess_shapes():
    from image_restoration_agent_tpu.retrieval.clip import preprocess

    img = np.random.default_rng(0).random((100, 160, 3), dtype=np.float32)
    out = preprocess(img, n_px=64)
    assert out.shape == (64, 64, 3)
    out = preprocess(img, n_px=64, target_ratio=1.25)
    assert out.shape == (64, 64, 3)


def test_tokenizer_roundtrip(tmp_path):
    """BPE with a tiny synthetic merges file: SOT/EOT framing, padding,
    merge application."""
    import gzip

    from image_restoration_agent_tpu.retrieval.tokenizer import (
        SimpleTokenizer, bytes_to_unicode)

    # build a merges file whose first merge joins 'si' etc.; padding
    # merges must be UNIQUE pairs (real merges are) or the vocab dedupes
    import itertools

    from image_restoration_agent_tpu.retrieval.tokenizer import (
        bytes_to_unicode as _b2u)

    alphabet = list(_b2u().values())
    pairs = (f"{a} {b}" for a, b in itertools.product(alphabet, alphabet))
    head = ["s i</w>", "d e"]
    need = 49152 - 256 - 2 - len(head) + 1 - 1  # minus #version line
    pad = [p for p in itertools.islice(pairs, need + 2)
           if p not in ("s i</w>", "d e")][:need]
    merges = ["#version: 0.2"] + head
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("\n".join(merges + pad))
    tok = SimpleTokenizer(path)
    assert len(tok.encoder) == 49408
    ids = tok.tokenize("si de", context_length=8)
    assert ids.shape == (1, 8)
    assert ids[0, 0] == tok.sot_id
    # 'si' merged to one token ending in </w>; 'de' merged but no </w> pair
    assert tok.encoder["si</w>"] in ids[0]
    b2u = bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256


def test_combiner_conversion_forward_parity():
    """Trained-Combiner conversion: torch combine_features (eval mode,
    dropouts off) == Flax Combiner on converted params."""
    from image_restoration_agent_tpu.convert.torch_import import (
        combiner_rules)
    from image_restoration_agent_tpu.retrieval.combiner import Combiner

    fdim, proj, hid = 16, 32, 64

    class TCombiner(tnn.Module):
        def __init__(self):
            super().__init__()
            self.text_projection_layer = tnn.Linear(fdim, proj)
            self.image_projection_layer = tnn.Linear(fdim, proj)
            self.combiner_layer = tnn.Linear(proj * 2, hid)
            self.output_layer = tnn.Linear(hid, fdim)
            self.dynamic_scalar = tnn.Sequential(
                tnn.Linear(proj * 2, hid), tnn.ReLU(), tnn.Dropout(0.5),
                tnn.Linear(hid, 1), tnn.Sigmoid())

        def combine(self, img, txt):
            tp = tF.relu(self.text_projection_layer(txt))
            ip = tF.relu(self.image_projection_layer(img))
            raw = torch.cat((tp, ip), -1)
            comb = tF.relu(self.combiner_layer(raw))
            ds = self.dynamic_scalar(raw)
            out = self.output_layer(comb) + ds * txt + (1 - ds) * img
            return tF.normalize(out, dim=-1)

    torch.manual_seed(1)
    tm = TCombiner().eval()
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    fm = Combiner(fdim, proj, hid)
    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, fdim)),
                        jnp.zeros((1, fdim))))
    params = convert_with_drops(state, combiner_rules(), template=template)

    rng = np.random.default_rng(4)
    img = rng.standard_normal((3, fdim)).astype(np.float32)
    txt = rng.standard_normal((3, fdim)).astype(np.float32)
    with torch.no_grad():
        want = tm.combine(torch.from_numpy(img),
                          torch.from_numpy(txt)).numpy()
    got = np.asarray(fm.apply(params, jnp.asarray(img), jnp.asarray(txt)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_clip_retrieval_embedder_pipeline(tmp_path):
    """CLIPRetrievalEmbedder end-to-end on the mini CLIP config: unit-norm
    640-d (here 16-d) embedding from a raw [0,1] image."""
    import gzip
    import itertools

    from image_restoration_agent_tpu.retrieval.combiner import Combiner
    from image_restoration_agent_tpu.retrieval.embedder import (
        CLIPRetrievalEmbedder)
    from image_restoration_agent_tpu.retrieval.tokenizer import (
        SimpleTokenizer, bytes_to_unicode)

    alphabet = list(bytes_to_unicode().values())
    pairs = (f"{a} {b}" for a, b in
             itertools.product(alphabet, alphabet))
    need = 49152 - 256 - 2 + 1 - 1
    pad = list(itertools.islice(pairs, need))
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("\n".join(["#version: 0.2"] + pad))
    tok = SimpleTokenizer(path)

    fm = _flax_model()
    clip_params = fm.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, RES, RES, 3)),
                          jnp.zeros((1, CTX), jnp.int32))
    comb = Combiner(EMBED, 32, 64)
    comb_params = comb.init(jax.random.PRNGKey(1), jnp.zeros((1, EMBED)),
                            jnp.zeros((1, EMBED)))

    emb = CLIPRetrievalEmbedder(clip_params, comb_params, tok,
                                n_px=RES, feature_dim=EMBED,
                                clip_model=fm, combiner_model=comb)
    img = np.random.default_rng(5).random((90, 120, 3), dtype=np.float32)
    out = emb.embed_array(img)
    assert out.shape == (EMBED,)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-5)


def test_clipiqa_scores(tmp_path):
    """ClipIQA on the mini CLIP: returns [0,1]; wiring through Scorer
    yields a real clipiqa value."""
    from image_restoration_agent_tpu.iqa.clipiqa import ClipIQA
    from image_restoration_agent_tpu.iqa.scorer import Scorer

    fm = _flax_model()
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)),
                     jnp.zeros((1, CTX), jnp.int32))
    # precomputed prompt features path (no tokenizer needed)
    tf = np.random.default_rng(0).standard_normal((2, EMBED)) \
        .astype(np.float32)
    iqa = ClipIQA(params, clip_model=fm, text_features=tf, n_px=RES)
    img = np.random.default_rng(1).random((70, 90, 3), dtype=np.float32)
    s = iqa(img)
    assert 0.0 <= s <= 1.0

    sc = Scorer(metrics=("psnr", "clipiqa"), clipiqa=iqa)
    out = sc.score_arrays(img, np.clip(img + 0.02, 0, 1))
    assert isinstance(out["clipiqa"], float)
    sc_none = Scorer(metrics=("clipiqa",))
    assert sc_none.score_arrays(img, img)["clipiqa"] is None


def test_clipiqa_native_resolution():
    """pyiqa-matching mode: no resize, attnpool positional embedding
    skipped, so arbitrary image sizes score without shape errors."""
    from image_restoration_agent_tpu.iqa.clipiqa import ClipIQA

    fm = CLIPModel(embed_dim=EMBED, vision_layers=V_LAYERS,
                   vision_width=V_WIDTH, image_resolution=RES,
                   text_width=T_WIDTH, text_layers=T_LAYERS,
                   text_heads=T_HEADS, vocab_size=VOCAB,
                   context_length=CTX, attnpool_pos=False)
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)),
                     jnp.zeros((1, CTX), jnp.int32))
    tf = np.random.default_rng(0).standard_normal((2, EMBED)) \
        .astype(np.float32)
    iqa = ClipIQA(params, clip_model=fm, text_features=tf,
                  native_resolution=True)
    assert iqa.native
    for shape in ((70, 90, 3), (64, 64, 3)):
        s = iqa(np.random.default_rng(2).random(shape, dtype=np.float32))
        assert 0.0 <= s <= 1.0
