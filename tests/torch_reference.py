"""Torch mirror of the JAX architecture for parity tests and CPU baselining.

This reimplements the *same math* as ``multimodal_timesfm_tpu`` in plain
PyTorch (the reference framework's backend), so that:

  * numerical parity tests can check the JAX forward/training math against an
    independent torch implementation (SURVEY.md §7: parity vs torch within fp
    tolerance), and
  * the CPU reference throughput for BASELINE_MEASURED.json can be measured
    in this zero-egress environment, where the upstream ``timesfm``/
    ``chronos`` packages the reference wraps are unavailable.

It intentionally mirrors the reference's execution model too: sequential
per-patch Welford loop, per-batch host loop, eager torch ops
(``/root/reference/src/tsfmx/trainer.py:185-245``).
"""

from __future__ import annotations

import math

import numpy as np
import torch
from torch import nn

R_SOFTPLUS_0 = 1.442695041


class ResidualBlock(nn.Module):
    def __init__(self, in_dim, hidden_dim, out_dim):
        super().__init__()
        self.hidden = nn.Linear(in_dim, hidden_dim)
        self.output = nn.Linear(hidden_dim, out_dim)
        self.residual = nn.Linear(in_dim, out_dim)

    def forward(self, x):
        return self.output(nn.functional.silu(self.hidden(x))) + self.residual(x)


class RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.scale = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps) * (1.0 + self.scale)).to(x.dtype)


class Attention(nn.Module):
    def __init__(self, model_dims, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = model_dims // num_heads
        self.qkv = nn.Linear(model_dims, 3 * model_dims)
        self.out = nn.Linear(model_dims, model_dims)
        self.per_dim_scale = nn.Parameter(torch.zeros(self.head_dim))

    def forward(self, x, paddings):
        b, s, _ = x.shape
        qkv = self.qkv(x).reshape(b, s, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (R_SOFTPLUS_0 / math.sqrt(self.head_dim)) * nn.functional.softplus(
            self.per_dim_scale
        )
        q = q * scale
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k).float()
        causal = torch.tril(torch.ones(s, s, dtype=torch.bool))
        mask = causal[None, None] & (~paddings)[:, None, None, :]
        logits = torch.where(mask, logits, torch.finfo(torch.float32).min)
        weights = torch.softmax(logits, dim=-1).to(x.dtype)
        o = torch.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, s, -1)
        return self.out(o)


class TransformerLayer(nn.Module):
    def __init__(self, model_dims, num_heads, ffn_dims):
        super().__init__()
        self.attn_norm = RMSNorm(model_dims)
        self.attn = Attention(model_dims, num_heads)
        self.ffn_norm = nn.LayerNorm(model_dims, eps=1e-6)
        self.ffn_up = nn.Linear(model_dims, ffn_dims)
        self.ffn_down = nn.Linear(ffn_dims, model_dims)

    def forward(self, x, paddings):
        x = x + self.attn(self.attn_norm(x), paddings)
        h = self.ffn_down(torch.relu(self.ffn_up(self.ffn_norm(x))))
        h = h * (~paddings)[..., None]
        return x + h


class TorchTimesFM(nn.Module):
    """Mirror of the JAX TimesFM backbone (same config fields)."""

    def __init__(self, patch_len=32, output_patch_len=128, model_dims=1280, ffn_dims=1280,
                 num_layers=20, num_heads=16, num_outputs=10, decode_index=5):
        super().__init__()
        self.p, self.o, self.q = patch_len, output_patch_len, num_outputs
        self.decode_index = decode_index
        self.tokenizer = ResidualBlock(2 * patch_len, model_dims, model_dims)
        self.layers = nn.ModuleList(
            [TransformerLayer(model_dims, num_heads, ffn_dims) for _ in range(num_layers)]
        )
        self.output_projection_point = ResidualBlock(
            model_dims, model_dims, output_patch_len * num_outputs
        )

    # -- preprocessing (sequential Welford, like the reference's loop) --
    def running_stats(self, patched, masks):
        b, n, p = patched.shape
        cnt = torch.zeros(b)
        mu = torch.zeros(b)
        m2 = torch.zeros(b)
        mus, sigmas = [], []
        for i in range(n):
            x, m = patched[:, i], masks[:, i]
            valid = (~m).float()
            nb = valid.sum(-1)
            safe_nb = nb.clamp(min=1.0)
            mu_b = (x * valid).sum(-1) / safe_nb
            m2_b = (valid * (x - mu_b[:, None]) ** 2).sum(-1)
            n_new = cnt + nb
            safe_n = n_new.clamp(min=1.0)
            delta = mu_b - mu
            mu_new = torch.where(nb > 0, mu + delta * nb / safe_n, mu)
            m2_new = torch.where(nb > 0, m2 + m2_b + delta * delta * cnt * nb / safe_n, m2)
            cnt, mu, m2 = n_new, mu_new, m2_new
            sigma = torch.where(cnt > 0, (m2 / safe_n).clamp(min=0).sqrt(), torch.zeros_like(mu))
            mus.append(mu)
            sigmas.append(sigma)
        return torch.stack(mus, 1), torch.stack(sigmas, 1)

    @staticmethod
    def revin(x, mu, sigma, reverse=False):
        extra = x.dim() - mu.dim()
        mu = mu.reshape(mu.shape + (1,) * extra)
        sigma = sigma.reshape(sigma.shape + (1,) * extra)
        safe = torch.where(sigma < 1e-6, torch.ones_like(sigma), sigma)
        return x * safe + mu if reverse else (x - mu) / safe

    def forward(self, horizon, inputs, masks, text_embeddings=None, fusion=None):
        b, c = inputs.shape
        patched = inputs.reshape(b, -1, self.p)
        pmasks = masks.reshape(b, -1, self.p)
        mu, sigma = self.running_stats(patched, pmasks)
        normed = self.revin(patched, mu, sigma)
        normed = torch.where(pmasks, torch.zeros_like(normed), normed)
        emb = self.tokenizer(torch.cat([normed, pmasks.float()], dim=-1))
        if text_embeddings is not None and fusion is not None:
            emb = emb + fusion(text_embeddings)
        per_patch = pmasks[..., -1]
        h = emb
        for layer in self.layers:
            h = layer(h, per_patch)
        out = self.output_projection_point(h)
        renormed = self.revin(out, mu, sigma, reverse=True).reshape(b, -1, self.o, self.q)
        return renormed[:, -1, :horizon, :]


class TorchFusion(nn.Module):
    def __init__(self, text_dims, ts_dims, hidden_dims=()):
        super().__init__()
        dims = [text_dims, *hidden_dims, ts_dims]
        layers = []
        for i in range(len(dims) - 1):
            layers += [nn.Linear(dims[i], dims[i + 1], bias=False), nn.ReLU()]
        self.net = nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


# ---------------------------------------------------------------------------
# JAX params -> torch state transfer (for parity tests)
# ---------------------------------------------------------------------------


def load_jax_params(model: TorchTimesFM, params: dict) -> None:
    """Copy a JAX TimesFM params pytree into the torch mirror."""

    def t(x):
        # copy=True: on the CPU backend jax.device_get can return zero-copy
        # views of the live jax buffers — in-place torch updates would
        # otherwise corrupt the jax params.
        return torch.from_numpy(np.array(x, dtype=np.float32, copy=True))

    def load_dense(mod: nn.Linear, p):
        mod.weight.data = t(p["kernel"]).T.contiguous()
        if "bias" in p:
            mod.bias.data = t(p["bias"])

    def load_res(mod: ResidualBlock, p):
        load_dense(mod.hidden, p["hidden"])
        load_dense(mod.output, p["output"])
        load_dense(mod.residual, p["residual"])

    load_res(model.tokenizer, params["tokenizer"])
    load_res(model.output_projection_point, params["output_projection_point"])
    stacked = params["stacked_xf"]
    for i, layer in enumerate(model.layers):
        sub = {k: np_index(v, i) for k, v in stacked.items()}
        layer.attn_norm.scale.data = t(sub["attn_norm"]["scale"])
        load_dense(layer.attn.qkv, sub["attn"]["qkv"])
        load_dense(layer.attn.out, sub["attn"]["out"])
        layer.attn.per_dim_scale.data = t(sub["attn"]["per_dim_scale"])
        layer.ffn_norm.weight.data = t(sub["ffn_norm"]["scale"])
        layer.ffn_norm.bias.data = t(sub["ffn_norm"]["bias"])
        load_dense(layer.ffn_up, sub["ffn_up"])
        load_dense(layer.ffn_down, sub["ffn_down"])


def np_index(tree, i):
    if isinstance(tree, dict):
        return {k: np_index(v, i) for k, v in tree.items()}
    return np.asarray(tree)[i]


def load_jax_fusion(model: TorchFusion, params: dict) -> None:
    linears = [m for m in model.net if isinstance(m, nn.Linear)]
    for lin, p in zip(linears, params["layers"]):
        lin.weight.data = (
            torch.from_numpy(np.array(p["kernel"], dtype=np.float32, copy=True)).T.contiguous()
        )


# ---------------------------------------------------------------------------
# Full training loop + test evaluation (the reference's composition)
# ---------------------------------------------------------------------------
#
# Mirrors the reference's end-to-end sweep-trial shape — train with per-epoch
# validation and best-checkpoint tracking, then evaluate test MSE/MAE with
# sample-weighted accumulation (/root/reference/scripts/tune_time_mmd_sweep.py
# :148-266, /root/reference/src/tsfmx/trainer.py:185-399,
# /root/reference/src/tsfmx/evaluator.py:29-71) — so the full-pipeline parity
# test can compare the JAX stack's split -> cache -> train -> test-eval
# composition against an independent torch run over the SAME pickled caches.


def _hf_linear_lambda(step: int, warmup: int, total: int) -> float:
    if step < warmup:
        return step / max(1, warmup)
    return max(0.0, (total - step) / max(1, total - warmup))


def _hf_cosine_lambda(step: int, warmup: int, total: int) -> float:
    if step < warmup:
        return step / max(1, warmup)
    progress = (step - warmup) / max(1, total - warmup)
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))


def _batch_tensors(samples: list, idx: np.ndarray, multimodal: bool):
    ctx = torch.from_numpy(np.stack([np.asarray(samples[i]["context"]) for i in idx]))
    hor = torch.from_numpy(np.stack([np.asarray(samples[i]["horizon"]) for i in idx]))
    text = None
    if multimodal:
        text = torch.from_numpy(
            np.stack([np.asarray(samples[i]["text_embeddings"], dtype=np.float32) for i in idx])
        )
    return ctx, hor, text


def torch_train_multimodal(
    model: TorchTimesFM,
    fusion: TorchFusion,
    train_samples: list,
    val_samples: list,
    *,
    horizon_len: int,
    batch_size: int,
    eval_batch_size: int,
    num_epochs: int,
    learning_rate: float,
    weight_decay: float,
    warmup_steps: int,
    max_grad_norm: float,
    scheduler_type: str = "linear",
    seed: int = 0,
) -> dict:
    """Frozen-backbone multimodal fine-tune with best-epoch fusion tracking.

    Batch order replicates the JAX trainer's shuffling exactly (one
    ``np.random.default_rng(seed).permutation`` draw per train epoch,
    deterministic val order), so trajectories are comparable point-for-point.
    Returns {"best_val_loss", "best_fusion_state", "val_losses"}.
    """
    model.requires_grad_(False)
    fusion.requires_grad_(True)
    n = len(train_samples)
    num_batches = math.ceil(n / batch_size)
    total_steps = num_epochs * num_batches
    optimizer = torch.optim.AdamW(
        fusion.parameters(), lr=learning_rate, weight_decay=weight_decay
    )
    lam = _hf_linear_lambda if scheduler_type == "linear" else _hf_cosine_lambda
    scheduler = torch.optim.lr_scheduler.LambdaLR(
        optimizer, lambda s: lam(s, warmup_steps, total_steps)
    )
    loss_fn = nn.MSELoss()
    perm_rng = np.random.default_rng(seed)

    def val_loss() -> float:
        n_val = len(val_samples)
        per_batch = []
        with torch.no_grad():
            for bi in range(math.ceil(n_val / eval_batch_size)):
                idx = np.arange(bi * eval_batch_size, min((bi + 1) * eval_batch_size, n_val))
                ctx, hor, text = _batch_tensors(val_samples, idx, multimodal=True)
                masks = torch.zeros_like(ctx, dtype=torch.bool)
                point = model(horizon_len, ctx, masks, text, fusion)[..., model.decode_index]
                per_batch.append(float(loss_fn(point, hor)))
        return float(np.mean(per_batch))

    best_val, best_state, val_losses = float("inf"), None, []
    for _ in range(num_epochs):
        order = perm_rng.permutation(n)
        for bi in range(num_batches):
            idx = order[bi * batch_size : (bi + 1) * batch_size]
            ctx, hor, text = _batch_tensors(train_samples, idx, multimodal=True)
            masks = torch.zeros_like(ctx, dtype=torch.bool)
            point = model(horizon_len, ctx, masks, text, fusion)[..., model.decode_index]
            loss = loss_fn(point, hor)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(fusion.parameters(), max_grad_norm)
            optimizer.step()
            optimizer.zero_grad()
            scheduler.step()
        vl = val_loss()
        val_losses.append(vl)
        if vl < best_val:
            best_val = vl
            best_state = {k: v.clone() for k, v in fusion.state_dict().items()}
    return {"best_val_loss": best_val, "best_fusion_state": best_state, "val_losses": val_losses}


def torch_evaluate(
    model: TorchTimesFM,
    fusion: TorchFusion | None,
    samples: list,
    *,
    horizon_len: int,
    batch_size: int,
) -> dict:
    """Sample-weighted test MSE/MAE (reference ``evaluator.py:59-71``)."""
    n = len(samples)
    total_se = total_ae = 0.0
    with torch.no_grad():
        for bi in range(math.ceil(n / batch_size)):
            idx = np.arange(bi * batch_size, min((bi + 1) * batch_size, n))
            ctx, hor, text = _batch_tensors(samples, idx, multimodal=fusion is not None)
            masks = torch.zeros_like(ctx, dtype=torch.bool)
            point = model(horizon_len, ctx, masks, text, fusion)[..., model.decode_index]
            err = point - hor
            total_se += float((err**2).mean(dim=-1).sum())
            total_ae += float(err.abs().mean(dim=-1).sum())
    return {"mse": total_se / n, "mae": total_ae / n}
