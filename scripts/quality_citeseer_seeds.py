"""Extend the TPU Citeseer multi-seed quality evidence (VERDICT r2
weak #6: 4 seeds left the within-1σ claim borderline at ≈1.1σ).

Runs the README Citeseer preset (use_pallas, matmul_precision=highest)
on extra seeds and merges into QUALITY.json under
``tpu_multiseed_r3_citeseer``.
"""

import dataclasses
import json
import sys

import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    import jax

    from mma_tpu.train import NODE_CLS_PRESETS
    from mma_tpu.train.loops import train_node_classification

    print("device:", jax.devices()[0], file=sys.stderr, flush=True)
    seeds = [int(s) for s in (sys.argv[1:] or ["3", "7", "11", "13"])]
    base = NODE_CLS_PRESETS["citeseer"]
    accs = {}
    for seed in seeds:
        cfg = dataclasses.replace(base, seed=seed, use_pallas=True)
        res = train_node_classification(cfg)
        accs[seed] = res["acc_test"]
        print(f"seed {seed}: acc_test {res['acc_test']:.4f}",
              file=sys.stderr, flush=True)

    with open("/root/repo/QUALITY.json") as f:
        q = json.load(f)
    q["tpu_multiseed_r3_citeseer"] = accs
    vals = list(accs.values())
    q["tpu_multiseed_r3_citeseer_summary"] = {
        "mean": float(np.mean(vals)), "sd": float(np.std(vals, ddof=1)),
        "n": len(vals),
    }
    with open("/root/repo/QUALITY.json", "w") as f:
        json.dump(q, f, indent=2)
    print(json.dumps(accs))


if __name__ == "__main__":
    main()
