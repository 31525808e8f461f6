#!/usr/bin/env python3
"""Run the real reference binaries (baselines/ref_build) on the five
BASELINE.md configs and record machine-readable numbers to
baselines/ref_baselines.json.

Per run we parse the driver's own printed statistics (statistics.cc:101-116,
montecarlosinglelevel.cc:97-102, montecarlomultilevel.cc:207-252):
Q +/- err, tau_int, sample counts, per-level costs, wall-clock timers and
the oracle-deviation ratio — and derive the north-star metric
effective_samples_per_sec = n_samples / (tau_int * method_wall_s).

The rotor config is swept over M_lat in {64, 128, 256} (tau_int vs a).
Usage: python3 run_ref_baselines.py [--quick]
"""

import json
import re
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
BUILD = HERE / "ref_build"
CONFIGS = HERE / "configs"
LOGS = HERE / "logs"

RUNS = [
    # (name, driver, config, {key: value overrides}), applied by regex
    ("harmonic_hmc", "driver_qm", "ref_qm_harmonic_hmc.in", {}),
    ("quartic_twolevel", "driver_qm", "ref_qm_quartic_twolevel.in", {}),
    ("rotor_cluster_M64", "driver_qm", "ref_qm_rotor_cluster.in",
     {"M_lat": "64"}),
    ("rotor_cluster_M128", "driver_qm", "ref_qm_rotor_cluster.in",
     {"M_lat": "128"}),
    ("rotor_cluster_M256", "driver_qm", "ref_qm_rotor_cluster.in",
     {"M_lat": "256"}),
    ("gff_twolevel", "driver_qft", "ref_qft_gff_twolevel.in", {}),
    ("schwinger_heatbath", "driver_qft", "ref_qft_schwinger_heatbath.in",
     {}),
    ("schwinger_mlmc", "driver_qft", "ref_qft_schwinger_mlmc.in", {}),
    ("sigma_heatbath", "driver_qft", "ref_qft_sigma_heatbath.in", {}),
]

FLOAT = r"([-+0-9.eE]+)"


def override(text: str, overrides: dict) -> str:
    for key, val in overrides.items():
        text = re.sub(rf"^(\s*{key}\s*=\s*)\S+", rf"\g<1>{val}", text,
                      flags=re.M)
    return text


def parse_stats_block(log: str, label: str) -> dict:
    """Parse one Statistics pretty-print block (statistics.cc:101-116)."""
    out = {}
    pats = {
        "avg": rf"{re.escape(label)}: Avg \+/- Err = {FLOAT} \+/- {FLOAT}",
        "var": rf"{re.escape(label)}: Var \+/- Err = {FLOAT} \+/- {FLOAT}",
        "tau_int": rf"{re.escape(label)}: tau_{{int}}\s+= {FLOAT}",
        "n_samples": rf"{re.escape(label)}: # samples\s+= {FLOAT}",
    }
    for k, p in pats.items():
        m = re.search(p, log)
        if m:
            if k in ("avg", "var"):
                out[k] = float(m.group(1))
                out[k + "_err"] = float(m.group(2))
            else:
                out[k] = float(m.group(1))
    return out


def parse_log(name: str, log: str, wall: float) -> dict:
    rec = {"run": name, "total_wall_s": round(wall, 3)}
    for tm in re.finditer(rf"\[timer (\w+)\] : {FLOAT} s", log):
        rec.setdefault("timers_s", {})[tm.group(1)] = float(tm.group(2))
    m = re.search(rf"\(analytical - numerical\) = {FLOAT} = {FLOAT} \*",
                  log)
    if m:
        rec["oracle_abs_dev"] = float(m.group(1))
        rec["oracle_sigma_dev"] = float(m.group(2))
    m = re.search(rf"acceptance probability\s+p = {FLOAT}", log)
    if m:
        rec["p_accept"] = float(m.group(1))

    if "mlmc" in name:
        levels = []
        for lm in re.finditer(
                rf"Y\[(\d)\]: Avg \+/- Err = {FLOAT} \+/- {FLOAT}", log):
            lvl = int(lm.group(1))
            block = parse_stats_block(log, f"Y[{lvl}]")
            tgt = re.search(
                rf"Y\[{lvl}\][\s\S]*?target number of samples = (\d+)", log)
            if tgt:
                block["n_target"] = int(tgt.group(1))
            block["level"] = lvl
            levels.append(block)
        rec["levels"] = levels
        costs = re.findall(rf" level (\d) : {FLOAT} s \[\s*{FLOAT} \] %",
                           log)
        rec["level_costs_s"] = {int(l): float(s) for l, s, _ in costs}
        m = re.search(rf" total = {FLOAT} s", log)
        if m:
            rec["mlmc_wall_s"] = float(m.group(1))
        n_fine = levels[0]["n_samples"] if levels else None
        if n_fine and rec.get("mlmc_wall_s"):
            tau = levels[0].get("tau_int", 1.0)
            rec["eff_samples_per_sec"] = round(
                n_fine / (tau * rec["mlmc_wall_s"]), 2)
    elif "twolevel" in name:
        for lbl, key in (("QoI[fine]", "fine"), ("QoI[coarse]", "coarse"),
                         ("delta QoI", "delta"),
                         ("QoI[coarsesampler]", "coarse_sampler")):
            b = parse_stats_block(log, lbl)
            if b:
                rec[key] = b
        # MonteCarloTwoLevel prints no method timer; prorate the total
        # timer over the sampling fraction (the TwoLevelMetropolisStep
        # constructor self-times 10000 extra draws,
        # twolevelmetropolisstep.cc:23-30, plus n_burnin burn-in draws).
        w = rec.get("timers_s", {}).get("total")
        if w and rec.get("delta"):
            n = rec["delta"].get("n_samples", 0)
            m = re.search(r"n_burnin = (\d+)[\s\S]*?-- twolevelmc", log)
            burn = int(m.group(1)) if m else 0
            w_est = w * n / max(n + 10000 + burn, 1)
            rec["method_wall_est_s"] = round(w_est, 4)
            tau = rec["delta"].get("tau_int", 1.0)
            rec["eff_samples_per_sec"] = round(n / (tau * w_est), 2)
    else:
        b = parse_stats_block(log, "Q")
        rec["Q"] = b
        w = rec.get("timers_s", {}).get("SinglevelMC")
        if w and b.get("n_samples"):
            tau = max(b.get("tau_int", 1.0), 1.0)
            rec["eff_samples_per_sec"] = round(
                b["n_samples"] / (tau * w), 2)
            rec["samples_per_sec"] = round(b["n_samples"] / w, 2)
    return rec


def main():
    quick = "--quick" in sys.argv
    # --only <substring>: run the matching subset and MERGE into the
    # existing ref_baselines.json instead of re-measuring everything
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    LOGS.mkdir(exist_ok=True)
    results = {}
    if only is not None and (HERE / "ref_baselines.json").exists():
        results = json.loads(
            (HERE / "ref_baselines.json").read_text()).get("runs", {})
    for name, driver, cfg, overrides in RUNS:
        if only is not None and only not in name:
            continue
        text = override((CONFIGS / cfg).read_text(), overrides)
        if quick:
            text = re.sub(r"n_samples = 1000000", "n_samples = 5000", text)
            text = re.sub(r"n_samples = 200000", "n_samples = 5000", text)
            text = re.sub(r"n_samples = 100000", "n_samples = 2000", text)
            text = re.sub(r"epsilon = 1.0E-3", "epsilon = 2.0E-2", text)
        run_cfg = LOGS / f"{name}.in"
        run_cfg.write_text(text)
        print(f"=== {name} ({driver} {cfg}) ===", flush=True)
        t0 = time.monotonic()
        proc = subprocess.run(
            [str(BUILD / driver), str(run_cfg)],
            capture_output=True, text=True, timeout=7200)
        wall = time.monotonic() - t0
        log = proc.stdout + proc.stderr
        (LOGS / f"{name}.out").write_text(log)
        if proc.returncode != 0:
            print(f"  FAILED rc={proc.returncode}; see logs/{name}.out",
                  flush=True)
            results[name] = {"run": name, "error": proc.returncode,
                             "total_wall_s": round(wall, 3)}
            continue
        rec = parse_log(name, log, wall)
        results[name] = rec
        print(f"  wall={wall:.1f}s eff={rec.get('eff_samples_per_sec')}"
              f" oracle_dev={rec.get('oracle_sigma_dev')}", flush=True)

    out = HERE / "ref_baselines.json"
    meta = {
        "binary": "reference C++ build (serial, g++ -O3 -march=haswell, "
                  "GSL shim + TF Eigen); see build_reference.sh",
        "host_cores": int((HERE / "ncores.txt").read_text())
        if (HERE / "ncores.txt").exists() else None,
        "runs": results,
    }
    out.write_text(json.dumps(meta, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
