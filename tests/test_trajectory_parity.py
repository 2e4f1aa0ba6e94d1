"""Training-trajectory parity: the JAX trainer vs an independent torch loop.

SURVEY.md §7 lists trainer semantics (loss scaling under accumulation,
clip-before-step ordering, per-step scheduler) as parity-critical for the
*training trajectory*, not just the forward pass. This test runs the real
MultimodalTrainer and a torch mirror loop from identical weights over the
identical batch sequence and compares the per-batch loss trajectory and
final parameters.
"""

import math

import numpy as np
import pytest
import torch

import jax

from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
from multimodal_timesfm_tpu.training_args import TrainingArguments
from multimodal_timesfm_tpu.types import PreprocessedSample

from tests.torch_reference import TorchTimesFM, load_jax_params

CFG = TimesFMConfig(
    input_patch_len=4, output_patch_len=8, model_dims=32, ffn_dims=48, num_layers=2, num_heads=4
)
CONTEXT, HORIZON = 16, 8
N, BATCH, EPOCHS, LR = 16, 8, 3, 1e-3


def _hf_linear_lambda(step, warmup, total):
    if step < warmup:
        return step / max(1, warmup)
    return max(0.0, (total - step) / max(1, total - warmup))


@pytest.mark.parametrize("accum", [1, 2])
def test_baseline_training_trajectory_matches_torch(tmp_path, accum):
    rng = np.random.default_rng(0)
    ctx = rng.normal(size=(N, CONTEXT)).astype(np.float32)
    hor = rng.normal(size=(N, HORIZON)).astype(np.float32)
    samples = [
        PreprocessedSample(context=ctx[i], horizon=hor[i], metadata={}) for i in range(N)
    ]

    # --- JAX side: the real trainer ---
    decoder = MultimodalDecoder(TimesFM2p5Adapter(CFG), MultimodalDecoderConfig())
    params = decoder.init(jax.random.key(0))
    trainer = MultimodalTrainer(
        model=decoder,
        params=params,
        args=TrainingArguments(
            output_dir=str(tmp_path / "out"),
            per_device_train_batch_size=BATCH,
            num_train_epochs=EPOCHS,
            learning_rate=LR,
            lr_scheduler_type="linear",
            warmup_steps=1,
            weight_decay=0.01,
            gradient_accumulation_steps=accum,
            max_grad_norm=1.0,
            eval_strategy="epoch",
            save_strategy="no",
            logging_strategy="no",
            seed=7,
        ),
        train_dataset=samples,
        val_dataset=samples[:8],
        mode="baseline",
    )

    # --- torch side: mirror loop with identical weights & batch order ---
    tmodel = TorchTimesFM(
        patch_len=CFG.input_patch_len,
        output_patch_len=CFG.output_patch_len,
        model_dims=CFG.model_dims,
        ffn_dims=CFG.ffn_dims,
        num_layers=CFG.num_layers,
        num_heads=CFG.num_heads,
    )
    load_jax_params(tmodel, jax.device_get(params["adapter"]))

    num_batches = math.ceil(N / BATCH)
    steps_per_epoch = math.ceil(num_batches / accum)
    total_steps = EPOCHS * steps_per_epoch
    optimizer = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=0.01)
    scheduler = torch.optim.lr_scheduler.LambdaLR(
        optimizer, lambda s: _hf_linear_lambda(s, 1, total_steps)
    )
    loss_fn = torch.nn.MSELoss()

    # Replicate the trainer's shuffling (numpy rng seeded from args.seed).
    perm_rng = np.random.default_rng(7)

    torch_losses = []
    for _ in range(EPOCHS):
        order = perm_rng.permutation(N)
        for bi in range(num_batches):
            idx = order[bi * BATCH : (bi + 1) * BATCH]
            c = torch.from_numpy(ctx[idx])
            h = torch.from_numpy(hor[idx])
            masks = torch.zeros_like(c, dtype=torch.bool)
            point = tmodel(HORIZON, c, masks)[..., CFG.decode_index]
            loss = loss_fn(point, h)
            (loss / accum).backward()
            torch_losses.append(float(loss))
            if (bi + 1) % accum == 0 or (bi + 1) == num_batches:
                torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
                optimizer.step()
                optimizer.zero_grad()
                scheduler.step()

    jax_epoch_means = [trainer.train_epoch() for _ in range(EPOCHS)]
    torch_epoch_means = [
        float(np.mean(torch_losses[e * num_batches : (e + 1) * num_batches]))
        for e in range(EPOCHS)
    ]

    np.testing.assert_allclose(jax_epoch_means, torch_epoch_means, rtol=2e-3)

    # final params agree (fp noise through Adam allowed)
    final_torch = TorchTimesFM(
        patch_len=CFG.input_patch_len,
        output_patch_len=CFG.output_patch_len,
        model_dims=CFG.model_dims,
        ffn_dims=CFG.ffn_dims,
        num_layers=CFG.num_layers,
        num_heads=CFG.num_heads,
    )
    load_jax_params(final_torch, jax.device_get(trainer.state.trainable))
    for (name, p_t), p_j in zip(tmodel.named_parameters(), final_torch.parameters()):
        np.testing.assert_allclose(
            p_t.detach().numpy(), p_j.detach().numpy(), atol=5e-4,
            err_msg=name,
        )
