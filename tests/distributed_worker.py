"""Worker process for the 2-process distributed test (tests/test_distributed.py).

Each worker pins the CPU platform (this environment's sitecustomize registers
the TPU PJRT plugin at interpreter start, so the ``jax.config`` pin after
import is required — see tests/conftest.py), joins a localhost
``jax.distributed`` cluster via Gloo CPU collectives, builds a mesh spanning
BOTH processes' devices, and runs one training epoch of the real
``MultimodalTrainer``. This drives ``parallel.mesh.put_global`` through its
``make_array_from_process_local_data`` branch — the one code path the
single-process 8-virtual-device mesh cannot reach (SURVEY.md §2.4 multi-host
DCN; reference is strictly single-process).

Run with ``num_processes=1`` for the single-process parity leg: identical
mesh geometry (8 devices either way), identical seeded data and permutation,
so the printed loss must match the 2-process run.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
Prints one line: ``LOSS <process_id> <train_loss>``.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    process_id, num_processes, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=num_processes,
            process_id=process_id,
        )
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np

    from multimodal_timesfm_tpu.models.decoder import (
        MultimodalDecoder,
        MultimodalDecoderConfig,
    )
    from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
    from multimodal_timesfm_tpu.data.dataset import PreprocessedDataset
    from multimodal_timesfm_tpu.parallel.mesh import MeshConfig, make_mesh
    from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
    from multimodal_timesfm_tpu.training_args import TrainingArguments
    from multimodal_timesfm_tpu.types import PreprocessedSample

    context, horizon, text_dims = 16, 8, 6

    # Every process builds the FULL dataset (the documented loader contract:
    # put_global slices each process's addressable shards out of a complete
    # host copy).
    rng = np.random.default_rng(0)
    samples = []
    for i in range(24):
        samples.append(
            PreprocessedSample(
                context=rng.normal(size=context).astype(np.float32),
                horizon=rng.normal(size=horizon).astype(np.float32),
                text_embeddings=rng.normal(size=(4, text_dims)).astype(np.float32),
                metadata={"i": i},
            )
        )

    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()),
        MultimodalDecoderConfig(text_embedding_dims=text_dims),
    )
    params = decoder.init(jax.random.key(0))
    trainer = MultimodalTrainer(
        model=decoder,
        params=params,
        args=TrainingArguments(
            output_dir="/tmp/dist_test_out",
            per_device_train_batch_size=8,
            num_train_epochs=1,
            learning_rate=1e-2,
            eval_strategy="no",
            save_strategy="no",
            logging_strategy="no",
            seed=0,
        ),
        train_dataset=PreprocessedDataset(samples, "multimodal"),
        val_dataset=PreprocessedDataset(samples[:8], "multimodal"),
        mode="multimodal",
        mesh=make_mesh(MeshConfig(data_parallel=8, model_parallel=1)),
    )
    loss = trainer.train_epoch()
    print(f"LOSS {process_id} {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
