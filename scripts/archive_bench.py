"""Collect round-3 bench logs from /tmp into benchmarks/*.json artifacts.

Each artifact embeds the raw JSON line(s) the bench printed plus metadata.
Run after the TPU bench queue drains: python scripts/archive_bench.py
"""

import datetime
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TODAY = datetime.date.today().isoformat()


def last_json_line(path):
    out = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    out = json.loads(line)
                except json.JSONDecodeError:
                    pass
    return out


def all_json_lines(path):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return out


def write(name, payload):
    dest = os.path.join(REPO, "benchmarks", name)
    with open(dest, "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", dest)


def main():
    hw = "TPU v5e (1 chip, attached via tunnel)"
    for cand in ("/tmp/bench_v2_final.log", "/tmp/bench_v2.log"):
        if not os.path.exists(cand):
            continue
        j = last_json_line(cand)
        if j:
            j.update({"hardware": hw, "date": TODAY, "command": "python bench.py",
                      "workload": "20 s utterance: S1 AR 500 tokens (fused kernel, bf16) -> S2 VQ decode -> flow reverse -> lane-folded HiFiGAN (bf16)"})
            write("BENCH_v2_r03.json", j)
            break
    for cand in ("/tmp/bench_v3_final2.log", "/tmp/bench_v3_final.log", "/tmp/bench_v3_fixed.log"):
        if not os.path.exists(cand):
            continue
        j = last_json_line(cand)
        if j:
            j.update({"hardware": hw, "date": TODAY, "command": "python scripts/bench_v3.py"})
            write("BENCH_v3_r03.json", j)
            break
    for cand in ("/tmp/bench_train3.log", "/tmp/bench_train2.log", "/tmp/bench_train.log"):
        if os.path.exists(cand):
            j = last_json_line(cand)
            if j:
                j.update({"date": TODAY, "command": "python scripts/bench_train.py"})
                # derived wall-clock for the product's headline few-shot
                # recipe (README.md:34 '1 minute of audio'): ~12 x 5 s
                # slices, reference defaults 8 S2 epochs + 15 S1 epochs,
                # batch 6/8 -> 2 steps/epoch. Compute is seconds; real
                # wall-clock adds one-time compiles + prep (hubert/bert
                # extraction), which dominate on a cold cache.
                try:
                    s2 = j["s2_gan_v2"]["step_s"] * 8 * 2
                    s1 = j["s1_adamw"]["step_s"] * 15 * 2
                    j["derived_few_shot_1min"] = {
                        "s2_8_epochs_s": round(s2, 3),
                        "s1_15_epochs_s": round(s1, 3),
                        "train_compute_total_s": round(s2 + s1, 3),
                        "assumptions": "12 slices of 5 s, 2 steps/epoch, excludes prep + one-time compiles",
                    }
                except KeyError:
                    pass
                write("BENCH_train_r03.json", j)
                break
    if os.path.exists("/tmp/bench_ttfb.log"):
        j = last_json_line("/tmp/bench_ttfb.log")
        if j:
            j.update({"date": TODAY, "command": "python scripts/bench_ttfb.py"})
            write("BENCH_ttfb_r03.json", j)
    for cand in ("/tmp/bench_throughput3.log", "/tmp/bench_throughput2.log", "/tmp/bench_throughput.log"):
        if not os.path.exists(cand):
            continue
        rows = all_json_lines(cand)
        if rows:
            dest = os.path.join(REPO, "benchmarks", "BENCH_throughput_v2_r03.jsonl")
            with open(dest, "w") as f:
                for r in rows:
                    r["date"] = TODAY
                    f.write(json.dumps(r) + "\n")
            print("wrote", dest)
            break


if __name__ == "__main__":
    main()
