"""Weight-converter parity: torch replicas of the reference modules (same
structure/state_dict names as model/block.py, recons_video_ori.py,
swinir.py) are converted into flax params and must produce the same
outputs. This is the proof that (a) the converter layout mapping is right
and (b) this framework's module semantics match the reference numerically.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from speinet_tpu.models.recons_video import ReconsVideo
from speinet_tpu.models.swinir import SwinIRCross
from speinet_tpu.utils.convert import (_copy_tree, convert_recons,
                                       convert_swinir, _set, conv_kernel)

torch.manual_seed(0)


# --- torch replicas with the reference's exact structure & names -----------

class TSe(nn.Module):
    def __init__(self, c, r=4):
        super().__init__()
        self.fc = nn.Sequential(nn.Linear(c, c // r), nn.ReLU(inplace=True),
                                nn.Linear(c // r, c), nn.Sigmoid())

    def forward(self, x):
        b, c = x.shape[:2]
        y = self.fc(x.mean(dim=(2, 3))).view(b, c, 1, 1)
        return x * y


class TBasicConv(nn.Module):
    def __init__(self, cin, cout, k, relu):
        super().__init__()
        layers = [nn.Conv2d(cin, cout, k, padding=k // 2)]
        if relu:
            layers.append(nn.ReLU(inplace=True))
        self.main = nn.Sequential(*layers)

    def forward(self, x):
        return self.main(x)


class TGateConv(nn.Module):
    def __init__(self, k):
        super().__init__()
        self.conv = nn.Conv2d(2, 1, k, padding=(k - 1) // 2, bias=False)
        self.bn = nn.BatchNorm2d(1, eps=1e-5, momentum=0.01)

    def forward(self, x):
        return self.bn(self.conv(x))


class TGate(nn.Module):
    def __init__(self, k):
        super().__init__()
        self.conv = TGateConv(k)

    def forward(self, x):
        z = torch.cat([x.max(1, keepdim=True)[0], x.mean(1, keepdim=True)], 1)
        return x * self.conv(z)


class TTriplet(nn.Module):
    def __init__(self):
        super().__init__()
        self.cw = TGate(7)
        self.hc = TGate(5)

    def forward(self, x):
        a = self.cw(x.permute(0, 3, 2, 1)).permute(0, 3, 2, 1)
        b = self.hc(x.permute(0, 2, 1, 3)).permute(0, 2, 1, 3)
        return a + b


class TResBlock(nn.Module):
    def __init__(self, c, k=5):
        super().__init__()
        self.main = nn.Sequential(TBasicConv(c, c, k, True),
                                  TBasicConv(c, c, k, False))
        self.se = TSe(c)
        self.te = TTriplet()

    def forward(self, x):
        x1 = self.main(x)
        return self.se(x1) + self.te(x1) + x


class TRecons(nn.Module):
    """Same stage names/indices as recons_video_ori.py:79-84."""

    def __init__(self, f=8, n_res=2, cout=3, k=5):
        super().__init__()
        def stack(cin, c, stride):
            return [nn.Sequential(nn.Conv2d(cin, c, k, stride=stride, padding=k // 2),
                                  nn.ReLU(inplace=True))] + \
                   [TResBlock(c, k) for _ in range(n_res)]
        self.inBlock = nn.Sequential(*stack(3, f, 1))
        self.encoder_first = nn.Sequential(*stack(f, f * 2, 2))
        self.encoder_second = nn.Sequential(*stack(f * 2, f * 4, 2))
        self.decoder_second = nn.Sequential(
            *([TResBlock(f * 4, k) for _ in range(n_res)] +
              [nn.Sequential(nn.ConvTranspose2d(f * 4, f * 2, 3, 2, 1, 1),
                             nn.ReLU(inplace=True))]))
        self.decoder_first = nn.Sequential(
            *([TResBlock(f * 2, k) for _ in range(n_res)] +
              [nn.Sequential(nn.ConvTranspose2d(f * 2, f, 3, 2, 1, 1),
                             nn.ReLU(inplace=True))]))
        self.outBlock = nn.Sequential(
            *([TResBlock(f, k) for _ in range(n_res)] +
              [nn.Conv2d(f, cout, k, padding=k // 2)]))

    def forward(self, x):
        lv1 = self.inBlock(x)
        lv3 = self.encoder_second(self.encoder_first(lv1))
        return self.outBlock(self.decoder_first(self.decoder_second(lv3)))


def randomize_bn_stats(mod, rng):
    for m in mod.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.standard_normal(m.running_mean.shape).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (0.5 + rng.random(m.running_var.shape).astype(np.float32))))


def test_recons_video_conversion(rng):
    t = TRecons(f=8, n_res=2)
    with torch.no_grad():
        randomize_bn_stats(t, rng)
    t.eval()
    sd = t.state_dict()

    model = ReconsVideo(n_feat=8, n_resblock=2, out_channels=3)
    x = rng.random((2, 24, 28, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _copy_tree(variables["params"])
    bstats = _copy_tree(variables["batch_stats"])
    convert_recons(sd, "", params, bstats, "", n_resblock=2)

    out = model.apply({"params": params, "batch_stats": bstats}, jnp.asarray(x))
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-4)


# --- torch cross-frame swin replica ----------------------------------------

class TWinAttn(nn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.dim, self.ws, self.heads = dim, ws, heads
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(torch.arange(ws), torch.arange(ws),
                                            indexing="ij")).flatten(1)
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv_x = nn.Linear(dim, dim * 2)
        self.qkv_y = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, y, mask=None):
        b_, n, c = x.shape
        h = self.heads
        kv = self.qkv_x(x).reshape(b_, n, 2, h, c // h).permute(2, 0, 3, 1, 4)
        q = self.qkv_y(y).reshape(b_, n, 1, h, c // h).permute(2, 0, 3, 1, 4)[0]
        k, v = kv[0], kv[1]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, h, n, n) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, h, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(out)


def t_window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def t_window_reverse(win, ws, h, w):
    b = win.shape[0] // (h * w // ws // ws)
    x = win.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class TMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TSwinBlock(nn.Module):
    def __init__(self, dim, heads, ws, shift, mlp_ratio):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TWinAttn(dim, ws, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))

    def calc_mask(self, h, w):
        img = torch.zeros((1, h, w, 1))
        cnt = 0
        for hs in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                   slice(-self.shift, None)):
            for wsl in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                        slice(-self.shift, None)):
                img[:, hs, wsl, :] = cnt
                cnt += 1
        mw = t_window_partition(img, self.ws).view(-1, self.ws * self.ws)
        m = mw.unsqueeze(1) - mw.unsqueeze(2)
        return m.masked_fill(m != 0, -100.0).masked_fill(m == 0, 0.0)

    def forward(self, x, y, size):
        h, w = size
        b, l, c = x.shape
        shortcut = x
        xn = self.norm1(x).view(b, h, w, c)
        yn = self.norm1(y).view(b, h, w, c)
        if self.shift:
            xn = torch.roll(xn, (-self.shift, -self.shift), (1, 2))
            yn = torch.roll(yn, (-self.shift, -self.shift), (1, 2))
            mask = self.calc_mask(h, w)
        else:
            mask = None
        aw = self.attn(t_window_partition(xn, self.ws).view(-1, self.ws ** 2, c),
                       t_window_partition(yn, self.ws).view(-1, self.ws ** 2, c),
                       mask)
        out = t_window_reverse(aw.view(-1, self.ws, self.ws, c), self.ws, h, w)
        if self.shift:
            out = torch.roll(out, (self.shift, self.shift), (1, 2))
        x = shortcut + out.reshape(b, l, c)
        return x + self.mlp(self.norm2(x))


class TRSTB(nn.Module):
    def __init__(self, dim, depth, heads, ws, mlp_ratio):
        super().__init__()
        class Grp(nn.Module):
            def __init__(s):
                super().__init__()
                s.blocks = nn.ModuleList([
                    TSwinBlock(dim, heads, ws, 0 if i % 2 == 0 else ws // 2,
                               mlp_ratio) for i in range(depth)])
        self.residual_group = Grp()
        self.conv = nn.Conv2d(dim, dim, 3, 1, 1)

    def forward(self, x, y, size):
        res = x
        for blk in self.residual_group.blocks:
            res = blk(res, y, size)
        b, l, c = res.shape
        img = res.transpose(1, 2).view(b, c, *size)
        return self.conv(img).flatten(2).transpose(1, 2) + x


class TSwinIR(nn.Module):
    def __init__(self, in_ch, dim, depths, heads, ws, mlp_ratio):
        super().__init__()
        self.conv_first = nn.Conv2d(in_ch, dim, 3, 1, 1)
        class PE(nn.Module):
            def __init__(s):
                super().__init__()
                s.norm = nn.LayerNorm(dim)
        self.patch_embed = PE()
        self.layers = nn.ModuleList([TRSTB(dim, d, h, ws, mlp_ratio)
                                     for d, h in zip(depths, heads)])
        self.norm = nn.LayerNorm(dim)
        self.conv_after_body = nn.Conv2d(dim, dim, 3, 1, 1)
        self.conv_last = nn.Conv2d(dim, in_ch, 3, 1, 1)

    def forward(self, x, y):
        size = (x.shape[2], x.shape[3])
        xf = self.conv_first(x)
        yf = self.conv_first(y)
        xe = self.patch_embed.norm(xf.flatten(2).transpose(1, 2))
        ye = self.patch_embed.norm(yf.flatten(2).transpose(1, 2))
        feat = xe
        for layer in self.layers:
            feat = layer(feat, ye, size)
        feat = self.norm(feat)
        b, l, c = feat.shape
        img = feat.transpose(1, 2).view(b, c, *size)
        res = self.conv_after_body(img) + xf
        return x + self.conv_last(res)


def test_swinir_cross_conversion(rng):
    dim, depths, heads, ws, mlp = 32, (2, 2), (4, 4), 5, 2.0
    t = TSwinIR(16, dim, depths, heads, ws, mlp).eval()
    sd = t.state_dict()

    m = SwinIRCross(embed_dim=dim, depths=depths, num_heads=heads,
                    window_size=ws, mlp_ratio=mlp, drop_path_rate=0.0)
    x = rng.random((2, 10, 15, 16)).astype(np.float32)
    y = rng.random((2, 10, 15, 16)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    params = _copy_tree(variables["params"])
    convert_swinir(sd, "", params, "", depths)

    got = np.asarray(m.apply({"params": params}, jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
