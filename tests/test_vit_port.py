"""ViT weight-port parity: timm-style torch state dict -> Flax params.

Builds a minimal torch ViT with timm's exact module names/packing (qkv fused,
pre-norm blocks, eps=1e-6 LayerNorms, exact GELU), randomizes it, ports the
state dict through ``load_timm_state_dict``, and checks the Flax forward
matches the torch forward — the correctness proof for pretrained-weight
loading (early_fusion_vit.py:84-147 role) without network access.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from eyegaze_tpu.models.vit import VisionTransformer, load_timm_state_dict  # noqa: E402

IMG, PATCH, EMBED, DEPTH, HEADS = 32, 8, 64, 2, 4


class TorchViT(nn.Module):
    """Minimal timm-compatible ViT (naming parity with vit_base_patch16_224)."""

    def __init__(self, img=IMG, patch=PATCH, embed=EMBED, depth=DEPTH,
                 heads=HEADS, num_classes=3):
        super().__init__()
        self.patch = patch
        self.heads = heads
        n = (img // patch) ** 2
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed, patch, patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, embed) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, embed) * 0.02)
        self.blocks = nn.ModuleList()
        for _ in range(depth):
            blk = nn.Module()
            blk.norm1 = nn.LayerNorm(embed, eps=1e-6)
            blk.attn = nn.Module()
            blk.attn.qkv = nn.Linear(embed, embed * 3)
            blk.attn.proj = nn.Linear(embed, embed)
            blk.norm2 = nn.LayerNorm(embed, eps=1e-6)
            blk.mlp = nn.Module()
            blk.mlp.fc1 = nn.Linear(embed, embed * 4)
            blk.mlp.fc2 = nn.Linear(embed * 4, embed)
            self.blocks.append(blk)
        self.norm = nn.LayerNorm(embed, eps=1e-6)
        self.head = nn.Linear(embed, num_classes)

    def forward(self, x):
        b = x.shape[0]
        h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)  # (B, N, E)
        h = torch.cat([self.cls_token.expand(b, -1, -1), h], dim=1)
        h = h + self.pos_embed
        e = h.shape[-1]
        hd = e // self.heads
        for blk in self.blocks:
            y = blk.norm1(h)
            qkv = blk.attn.qkv(y).reshape(b, -1, 3, self.heads, hd)
            q, k, v = qkv.unbind(2)
            q = q.transpose(1, 2)
            k = k.transpose(1, 2)
            v = v.transpose(1, 2)
            attn = (q @ k.transpose(-2, -1)) / (hd ** 0.5)
            attn = attn.softmax(dim=-1)
            y = (attn @ v).transpose(1, 2).reshape(b, -1, e)
            h = h + blk.attn.proj(y)
            y = blk.norm2(h)
            y = blk.mlp.fc2(torch.nn.functional.gelu(blk.mlp.fc1(y)))
            h = h + y
        h = self.norm(h)
        return self.head(h[:, 0])


def _state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_port_matches_torch_forward():
    torch.manual_seed(0)
    tmodel = TorchViT().eval()
    state = _state_dict_np(tmodel)

    fmodel = VisionTransformer(img_size=IMG, patch_size=PATCH, embed_dim=EMBED,
                               depth=DEPTH, num_heads=HEADS, num_classes=3)
    x = np.random.default_rng(1).normal(size=(2, 3, IMG, IMG)).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = load_timm_state_dict(dict(variables["params"]), state, backbone_key="")
    got = np.asarray(fmodel.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_port_full_vit_b_dimensions():
    """Full ViT-B/16 capacity (768 embed / 12 layers / 12 heads, 224x224, 197
    tokens): forward parity at the exact dimensions of the reference's
    pretrained backbone (early_fusion_vit.py:84-101), not just the 64-dim
    mini."""
    torch.manual_seed(2)
    tmodel = TorchViT(img=224, patch=16, embed=768, depth=12, heads=12).eval()
    state = _state_dict_np(tmodel)
    fmodel = VisionTransformer(img_size=224, patch_size=16, embed_dim=768,
                               depth=12, num_heads=12, num_classes=3)
    x = np.random.default_rng(3).normal(size=(2, 3, 224, 224)).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = load_timm_state_dict(dict(variables["params"]), state, backbone_key="")
    got = np.asarray(fmodel.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_export_cli_roundtrip(tmp_path):
    """scripts/export_timm_weights.py --state-dict -> .npz -> Flax load:
    loading must verifiably change the randomly initialized params."""
    import subprocess
    import sys as _sys
    from pathlib import Path as _Path

    torch.manual_seed(3)
    tmodel = TorchViT().eval()
    sd_path = tmp_path / "vit.pth"
    torch.save(tmodel.state_dict(), sd_path)
    npz_path = tmp_path / "vit.npz"
    root = _Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [_sys.executable, str(root / "scripts/export_timm_weights.py"),
         "--state-dict", str(sd_path), "--output", str(npz_path)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]
    assert "2 blocks" in r.stdout

    state = dict(np.load(npz_path))
    assert state["patch_embed.proj.weight"].dtype == np.float32
    fmodel = VisionTransformer(img_size=IMG, patch_size=PATCH, embed_dim=EMBED,
                               depth=DEPTH, num_heads=HEADS, num_classes=3)
    x = np.random.default_rng(4).normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(1), jnp.asarray(x))
    before = np.asarray(variables["params"]["block_0"]["mlp"]["fc1"]["kernel"]).copy()
    params = load_timm_state_dict(dict(variables["params"]), state, backbone_key="")
    after = np.asarray(params["block_0"]["mlp"]["fc1"]["kernel"])
    assert np.abs(after - before).max() > 1e-3  # init verifiably changed
    np.testing.assert_allclose(after, state["blocks.0.mlp.fc1.weight"].T)


def test_port_6channel_surgery():
    """concat mode widens the patch embed with 'duplicate'/'average' init
    (early_fusion_vit.py:133-146): duplicate means a 6-channel input made of
    the same image twice must produce 2x the 3-channel patch response minus
    the extra bias contribution... verified structurally instead: the two
    kernel halves are equal ('duplicate') or the second is the channel mean
    ('average')."""
    torch.manual_seed(1)
    tmodel = TorchViT().eval()
    state = _state_dict_np(tmodel)
    fmodel = VisionTransformer(img_size=IMG, patch_size=PATCH, in_channels=6,
                               embed_dim=EMBED, depth=DEPTH, num_heads=HEADS,
                               num_classes=3)
    x6 = np.zeros((1, 6, IMG, IMG), np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x6))

    params_dup = load_timm_state_dict(dict(variables["params"]), state,
                                      backbone_key="",
                                      weight_init_strategy="duplicate")
    k = np.asarray(params_dup["patch_embed"]["kernel"])
    np.testing.assert_array_equal(k[:, :, 0:3], k[:, :, 3:6])

    params_avg = load_timm_state_dict(dict(variables["params"]), state,
                                      backbone_key="",
                                      weight_init_strategy="average")
    k = np.asarray(params_avg["patch_embed"]["kernel"])
    np.testing.assert_allclose(k[:, :, 3:6],
                               np.repeat(k[:, :, 0:3].mean(axis=2, keepdims=True), 3, axis=2),
                               rtol=1e-6)
