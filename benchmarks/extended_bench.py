"""Extended benchmarks beyond bench.py's headline: per-workload train-step
throughput (imagecond conv config, pod-scale config in f32 and bf16) vs
the torch-CPU oracle.  Results -> benchmarks/extended_results.json.

Usage: python benchmarks/extended_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _median3(fn, scale: int) -> float:
    fn()  # extra warmup
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) / scale)
    return float(np.median(ts))


def torch_cpu_imagecond(batch=64, k=8, image_size=32):
    """Conv-encoder oracle steps/sec on CPU (batch scaled down; eager
    torch throughput is ~linear in batch, reported per-example)."""
    import torch

    from oracle.torch_oracle import TorchImageNDivGAN

    gan = TorchImageNDivGAN(image_size=image_size, seed=0)
    images = torch.rand(batch, image_size, image_size, 3)
    real = torch.rand(batch, 64)
    gan.train_step_images(images, real, k)
    t = _median3(lambda: gan.train_step_images(images, real, k), 1)
    return {"batch": batch, "step_s": t, "examples_per_s": batch / t}


def tpu_config(preset: str, chunk: int, **overrides):
    import jax

    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_chunk
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config(preset, dp_shards=1, div_shards=1, **overrides)
    state = create_train_state(cfg)
    state, m = train_chunk(cfg, state, chunk)
    np.asarray(m["g_ndiv"][-1])  # compile + honest sync

    def run():
        nonlocal state
        state, mm = train_chunk(cfg, state, chunk)
        np.asarray(mm["g_ndiv"][-1])

    t = _median3(run, chunk)
    return {"preset": preset, "batch": cfg.batch_size, "k": cfg.k,
            "compute_dtype": cfg.compute_dtype, "backend": jax.default_backend(),
            "step_s": t, "steps_per_s": 1.0 / t,
            "examples_per_s": cfg.batch_size / t}


def main():
    results = {
        "imagecond_cpu": torch_cpu_imagecond(),
        "imagecond_tpu": tpu_config("imagecond", chunk=200),
        # The preset defaults to bf16; pin each dtype explicitly.
        "pod_dp_tpu_f32": tpu_config("pod_dp", chunk=50,
                                     compute_dtype="f32"),
        "pod_dp_tpu_bf16": tpu_config("pod_dp", chunk=50,
                                      compute_dtype="bf16"),
    }
    results["imagecond_vs_cpu"] = round(
        results["imagecond_tpu"]["examples_per_s"]
        / results["imagecond_cpu"]["examples_per_s"], 2)
    out = os.path.join(os.path.dirname(__file__), "extended_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
