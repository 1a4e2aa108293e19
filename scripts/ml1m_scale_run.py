"""ML-1M-scale training demonstration (the reference's Ntrain=800k workload).

The real ml-1m data is absent from the reference checkout, so this drives the
exact 1m_movielensExperiment.jl shape (6040 users x 3883 movies, 800k train
ratings, full-w + side info SGLD) on synthetic power-law data with a known
rank-15 ground truth. Records epoch wall time and test RMSE vs the
constant-predictor floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

from gpt_tpu.data import make_synthetic_ml1m
from gpt_tpu.experiments import configs as C
from gpt_tpu.experiments.movielens import run_movielens
from gpt_tpu.utils.records import append_record

RECORDS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECORDS.jsonl")


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    t0 = time.time()
    fold = make_synthetic_ml1m()
    gen_s = time.time() - t0
    print(f"generated {len(fold.train)}+{len(fold.test)} ratings in {gen_s:.1f}s", flush=True)

    t0 = time.time()
    run = run_movielens(fold, C.MOVIELENS_100K, jax.random.PRNGKey(11), maxepoch=epochs)
    wall = time.time() - t0

    y_raw = fold.test[:, 2] * fold.rating_std + fold.rating_mean
    const = float(np.sqrt(np.mean((y_raw - fold.rating_mean) ** 2)))
    metrics = {
        "n_train": int(len(fold.train)),
        "epochs": epochs,
        "seconds": round(wall, 1),
        "seconds_per_epoch": round(wall / epochs, 2),
        "best_avg_rmse": run.best_rmse,
        "const_predictor_rmse": const,
        "rejected": run.rejected,
    }
    append_record(RECORDS, "ml1m_synthetic_scale", metrics)
    print(metrics, flush=True)


if __name__ == "__main__":
    main()
