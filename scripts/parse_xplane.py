"""Summarize a jax.profiler xplane.pb trace: self-time by HLO category and by
model-source op path (the hosted xprof UI is unreachable from this box).

Usage: python scripts/parse_xplane.py /tmp/aid_trace [top_n]
"""
import collections
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def load(path):
    if os.path.isdir(path):
        cands = []
        for root, _, files in os.walk(path):
            cands += [os.path.join(root, f) for f in files if f.endswith(".xplane.pb")]
        assert cands, f"no .xplane.pb under {path}"
        path = sorted(cands)[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    xs = load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/aid_trace")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    focus_cat = sys.argv[3] if len(sys.argv) > 3 else ""

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        smeta = {k: v.name for k, v in plane.stat_metadata.items()}
        emeta = {k: v for k, v in plane.event_metadata.items()}
        by_cat = collections.Counter()
        by_src = collections.Counter()
        by_srcline = collections.Counter()
        by_focus = collections.Counter()
        total = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ps / 1e9  # ms
                total += dur
                md = emeta.get(ev.metadata_id)
                stats = {}
                pools = list(ev.stats) + (list(md.stats) if md else [])
                for st in pools:
                    key = smeta.get(st.metadata_id, "?")
                    val = (st.str_value or st.ref_value or st.int64_value
                           or st.uint64_value or st.double_value)
                    if st.ref_value:
                        val = smeta.get(st.ref_value, st.ref_value)
                    stats[key] = val
                cat = str(stats.get("hlo_category", "?"))
                by_cat[cat] += dur
                opname = str(stats.get("tf_op", stats.get("op_name", "")))
                # collapse to model-block path: e.g. down_1_res/conv_0
                m = re.search(r"(transpose\(jvp|jvp)\(UnetCQT\)+/([\w/]+)", opname)
                if m:
                    part = "bwd" if m.group(1).startswith("transpose") else "fwd"
                    path = m.group(2)
                    segs = path.split("/")
                    blk = segs[0]
                    blk = re.sub(r"(down|up)_\d+", r"\1", blk)
                    op = segs[1] if len(segs) > 1 else ""
                    op = re.sub(r"_\d+$", "", op)
                    by_src[f"{part}:{blk}/{op}"] += dur
                else:
                    m2 = re.search(r"jit\(\w+\)/(\w+)", opname)
                    by_src[("other:" + (m2.group(1) if m2 else opname[:40]))] += dur
                sl = stats.get("source", "")
                if sl:
                    by_srcline[str(sl)] += dur
                if cat == focus_cat:
                    by_focus[f"{opname[:110]}"] += dur
        if total == 0:
            continue
        print(f"== plane {plane.name}: total XLA-op time {total:.2f} ms")
        print("-- by HLO category --")
        for n, t in by_cat.most_common(20):
            print(f"  {t:9.3f} ms {100*t/total:5.1f}%  {n}")
        print("-- by model op path --")
        for n, t in by_src.most_common(top_n):
            print(f"  {t:9.3f} ms {100*t/total:5.1f}%  {n}")
        print("-- by source line --")
        for n, t in by_srcline.most_common(15):
            print(f"  {t:9.3f} ms {100*t/total:5.1f}%  {n}")
        if focus_cat:
            print(f"-- ops in category {focus_cat!r} --")
            for n, t in by_focus.most_common(top_n):
                print(f"  {t:9.3f} ms {100*t/total:5.1f}%  {n}")


if __name__ == "__main__":
    main()
