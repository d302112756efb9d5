"""Residue budget: op-class roofline table for the guided score (VERDICT r3 #2).

Reads a jax.profiler trace (written by scripts/profile_score.py with
PROFILE_TRACE=...) through xprof's roofline_model tool and prints, per HLO
category: self time, achieved FLOP rate and HBM bandwidth, roofline
efficiency at each op's own operational intensity, and the RECOVERABLE
milliseconds — self time x (1 - roofline_efficiency), i.e. what a perfect
implementation AT THE SAME op mix and data movement could still win. The sum
of the recoverable column is the honest remaining headroom of the program;
structural wins (removing ops / bytes entirely) are not in it by definition.

Usage: python scripts/residue_budget.py [trace_dir] [n_reps] [top_ops]

n_reps = identical dispatches in the trace (profile_score traces 3 score
calls); per-score numbers divide by it.
"""
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/aid_trace_r4"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    top_ops = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    pbs = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                           recursive=True)) if os.path.isdir(path) else [path]
    data, _ = xspace_to_tool_data(pbs, "roofline_model", {})
    tbl = json.loads(data.decode() if isinstance(data, bytes) else data)[0]
    cols = [c["id"] for c in tbl["cols"]]
    rows = [dict(zip(cols, [c["v"] for c in r["c"]])) for r in tbl["rows"]]
    # every op appears twice (include_infeed_outfeed True/False duplicates)
    rows = [r for r in rows if r.get("step") == "Total"
            and r.get("include_infeed_outfeed") in (False, "false", 0)]

    prog = next(r for r in rows if r.get("category") == "Program")
    ops = [r for r in rows if r.get("category") not in ("Program", None)
           and (r.get("total_self_time") or 0) > 0]

    by_cat = {}
    for r in ops:
        t = float(r["total_self_time"]) / 1e3 / n_reps          # ms/score
        eff = float(r.get("roofline_efficiency") or 0.0)
        eff = min(max(eff, 0.0), 1.0)
        d = by_cat.setdefault(r["category"], dict(
            t=0.0, rec=0.0, fl=0.0, bw=0.0, hbm=0.0, n=0))
        d["t"] += t
        d["rec"] += t * (1.0 - eff)
        d["fl"] += t * float(r.get("measured_flop_rate") or 0.0) / 1e3  # TF
        d["bw"] += t * float(r.get("measured_memory_bw") or 0.0)        # GiB
        d["hbm"] += t * float(r.get("hbm_bw") or 0.0)
        d["n"] += int(r.get("occurrences") or 1)

    total_t = sum(d["t"] for d in by_cat.values())
    total_rec = sum(d["rec"] for d in by_cat.values())
    print(f"program: {float(prog['total_time_per_core'])/1e3/n_reps:.2f} "
          f"ms/score  avg {float(prog['measured_flop_rate'])/1e3:.1f} TF/s "
          f"({100*float(prog['measured_flop_rate'])/float(prog['optimal_flop_rate']):.0f}% of "
          f"{float(prog['optimal_flop_rate'])/1e3:.0f} peak)  "
          f"avg HBM {float(prog['hbm_bw']):.0f} GiB/s "
          f"({100*float(prog['max_mem_bw_utilization']):.0f}% of peak)  "
          f"OI {float(prog['operational_intensity']):.0f} FLOP/B")
    print(f"{'category':<26}{'ms':>8}{'%':>6}{'TF/s':>8}{'mem GiB/s':>10}"
          f"{'HBM GiB/s':>10}{'roofl%':>8}{'recov ms':>10}")
    for cat, d in sorted(by_cat.items(), key=lambda kv: -kv[1]["t"]):
        fl = d["fl"] / d["t"] if d["t"] else 0.0
        bw = d["bw"] / d["t"] if d["t"] else 0.0
        hbm = d["hbm"] / d["t"] if d["t"] else 0.0
        print(f"{cat:<26}{d['t']:8.2f}{100*d['t']/total_t:6.1f}"
              f"{fl:8.1f}{bw:10.0f}{hbm:10.0f}"
              f"{100*(1-d['rec']/d['t']):8.1f}{d['rec']:10.2f}")
    print(f"{'TOTAL':<26}{total_t:8.2f}{100.0:6.1f}{'':8}{'':10}{'':10}"
          f"{100*(1-total_rec/total_t):8.1f}{total_rec:10.2f}")

    print(f"\n-- top {top_ops} ops by recoverable ms (per score) --")
    for r in sorted(ops, key=lambda r: -float(r["total_self_time"])
                    * (1 - min(max(float(r.get("roofline_efficiency") or 0),
                                   0), 1)))[:top_ops]:
        t = float(r["total_self_time"]) / 1e3 / n_reps
        eff = min(max(float(r.get("roofline_efficiency") or 0), 0), 1)
        src = str(r.get("source_info") or "")[-40:]
        print(f"  {t:7.3f} ms  rec {t*(1-eff):6.3f}  eff {100*eff:5.1f}%  "
              f"{r['bound_by']:<7} {r['category']:<22} {r['operation']:<18}"
              f" {src}")


if __name__ == "__main__":
    main()
