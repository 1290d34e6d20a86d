"""Round-5 multi-seed quality refresh (VERDICT r4 #7).

Runs the README Cora + Citeseer presets (fused Pallas path,
matmul_precision=highest) on 4 seeds each ON the round-5 tree and
merges into QUALITY.json under ``tpu_multiseed_r5``. Done-gate: within
1σ of the CPU table (Cora 0.849 ± 0.005, Citeseer 0.711 ± 0.011).
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
    seeds = [0, 1, 2, 42]
    out = {}
    for ds in ("cora", "citeseer"):
        base = NODE_CLS_PRESETS[ds]
        accs = {}
        for seed in seeds:
            cfg = dataclasses.replace(base, seed=seed, use_pallas=True)
            res = train_node_classification(cfg)
            accs[seed] = res["acc_test"]
            print(f"{ds} seed {seed}: acc_test {res['acc_test']:.4f}",
                  file=sys.stderr, flush=True)
        vals = list(accs.values())
        out[ds] = {
            "per_seed": accs,
            "mean": float(np.mean(vals)),
            "sd": float(np.std(vals, ddof=1)),
        }

    with open("/root/repo/QUALITY.json") as f:
        q = json.load(f)
    q["tpu_multiseed_r5"] = out
    with open("/root/repo/QUALITY.json", "w") as f:
        json.dump(q, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
