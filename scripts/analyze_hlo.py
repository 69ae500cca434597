"""Join a perfetto device trace with the optimized HLO to attribute time.

``trace_serving.py`` aggregates device time by XLA op name (``fusion.79``,
``add_maximum_fusion.3``, ...) but those names say nothing about what the
fusion computes. This script recompiles the same serving graph (warm
persistent cache), dumps ``compiled.as_text()``, maps every named
instruction to the ops inside its fused computation, and re-buckets the
trace aggregate into conv / dot / elementwise / copy / sort / pool classes
with shapes — the attribution the roofline model (scripts/roofline.py)
is compared against.

Usage: python scripts/analyze_hlo.py --trace /tmp/lvc_trace_*/...json.gz
       (omit --trace to only print the HLO census)
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_hlo_fusions(hlo_text):
    """Map each fusion/instruction name -> set of notable ops inside it.

    Returns {name: {"kinds": Counter, "convs": [shape strings], "root": str}}.
    """
    # computation name -> list of (op, line)
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"\s*(%?[\w\.\-]+)\s*(\([^)]*\))?\s*->.*{$", line)
        m2 = re.match(r"\s*(ENTRY\s+)?%?([\w\.\-]+)\s+\(", line)
        if line.rstrip().endswith("{") and ("(" in line and ")" in line):
            name = line.strip().split()[0].lstrip("%")
            if name == "ENTRY":
                name = line.strip().split()[1].lstrip("%")
            cur = name.rstrip("(").split("(")[0]
            comps[cur] = []
            continue
        if line.strip().startswith("}"):
            cur = None
            continue
        if cur is not None:
            lm = re.match(r"\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*(\S+)\s+(\S+)\(", line)
            if lm:
                comps[cur].append((lm.group(1), lm.group(3), lm.group(2), line.strip()))
    # instruction name -> info, from every computation: find `fusion(...) kind=..., calls=%comp`
    info = {}
    for cname, instrs in comps.items():
        for iname, op, shape, line in instrs:
            if op.startswith("fusion"):
                cm = re.search(r"calls=%?([\w\.\-]+)", line)
                called = cm.group(1) if cm else None
                kinds = collections.Counter()
                convs = []
                dots = []
                if called and called in comps:
                    for _n, o, s, _l in comps[called]:
                        kinds[o.split("(")[0]] += 1
                        if o.startswith("convolution"):
                            convs.append(s)
                        if o.startswith("dot"):
                            dots.append(s)
                info[iname] = {"kinds": kinds, "convs": convs, "dots": dots,
                               "shape": shape}
            elif op.split("(")[0] in ("convolution", "dot", "sort", "copy",
                                      "reshape", "pad", "transpose", "while",
                                      "custom-call", "broadcast", "concatenate",
                                      "reduce-window", "select-and-scatter",
                                      "all-reduce", "scatter", "gather",
                                      "dynamic-slice", "dynamic-update-slice",
                                      "add", "maximum", "convert", "bitcast",
                                      "broadcast_in_dim", "iota", "slice"):
                info[iname] = {"kinds": collections.Counter({op.split("(")[0]: 1}),
                               "convs": [], "dots": [], "shape": shape}
    return info


def classify(name, meta):
    if meta is None:
        n = name.lower()
        if "conv" in n:
            return "conv"
        if "pool" in n or "roi" in n:
            return "pallas-pool"
        if "sort" in n or "top-k" in n:
            return "sort/topk"
        if "copy" in n or "transpose" in n or "reshape" in n or "pad" in n or "convert" in n or "bitcast" in n or "broadcast" in n:
            return "layout (copy/reshape/pad)"
        if "while" in n:
            return "while-loop"
        if "add_maximum" in n:
            return "residual add+relu"
        return "unknown"
    k = meta["kinds"]
    if meta["convs"]:
        return "conv"
    if meta["dots"]:
        return "dot (fc/matmul)"
    if k.get("custom-call"):
        return "pallas-pool"
    if k.get("sort"):
        return "sort/topk"
    if k.get("scatter") or k.get("gather") or k.get("dynamic-slice") or k.get("dynamic-update-slice"):
        return "gather/scatter"
    if k.get("reduce-window") or k.get("select-and-scatter"):
        return "pool (maxpool)"
    total = sum(k.values())
    layout = sum(k.get(o, 0) for o in ("copy", "reshape", "pad", "transpose",
                                       "convert", "bitcast", "slice",
                                       "concatenate", "broadcast"))
    if total and layout / total > 0.5:
        return "layout (copy/reshape/pad)"
    return "elementwise"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="perfetto .trace.json.gz")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--depth", type=int, default=101)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "lvc_tpu", "jax_bench_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import __graft_entry__ as g
    from lvc_tpu.modeling.meta_arch.build import build_model

    cfg = g._small_cfg()
    cfg.MODEL.RESNETS.DEPTH = args.depth
    cfg.MODEL.DTYPE = "bfloat16"
    cfg.MODEL.ROI_HEADS.POOLER_IMPL = "pallas_fast"
    model = build_model(cfg)
    batch = g._make_batch(B=args.batch, H=832, W=1344)
    variables = g.fast_init(model, {"params": jax.random.PRNGKey(0)}, batch, train=False)
    compiled = jax.jit(
        lambda b: model.apply(variables, b, train=False)
    ).lower(batch).compile()
    hlo = compiled.as_text()
    info = parse_hlo_fusions(hlo)
    print(f"parsed {len(info)} named HLO instructions")

    if not args.trace:
        pats = glob.glob("/tmp/lvc_trace_*/**/*.trace.json.gz", recursive=True)
        if pats:
            args.trace = max(pats, key=os.path.getmtime)
            print("using latest trace:", args.trace)
        else:
            return
    with gzip.open(args.trace, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    tid_names = {}
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e["args"].get("name", "")

    def is_device(pid, tid):
        tn = tid_names.get((pid, tid), "")
        pn = pid_names.get(pid, "")
        return ("XLA Ops" in tn) or ("TensorFlow Op" in tn and "TPU" in pn)

    agg = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and is_device(e.get("pid"), e.get("tid")):
            agg[e.get("name", "?")] += e.get("dur", 0) / 1e3

    iters = 5  # trace_serving default
    total = sum(agg.values())
    bins = collections.Counter()
    bin_members = collections.defaultdict(list)
    for name, dur in agg.items():
        meta = info.get(name) or info.get(name.split("/")[-1])
        c = classify(name, meta)
        bins[c] += dur
        bin_members[c].append((dur, name, meta))
    print(f"\ndevice total {total / iters:.2f} ms/batch; by class:")
    for c, dur in bins.most_common():
        print(f"  {dur / iters:8.3f} ms  {100 * dur / total:5.1f}%  {c}")
    for c, dur in bins.most_common():
        print(f"\n== {c} ({dur / iters:.2f} ms) top members:")
        for d, n, meta in sorted(bin_members[c], reverse=True)[:10]:
            extra = ""
            if meta:
                if meta["convs"]:
                    extra = " convs: " + "; ".join(meta["convs"][:2])
                elif meta["dots"]:
                    extra = " dots: " + "; ".join(meta["dots"][:2])
                else:
                    extra = " ops: " + ",".join(f"{k}x{v}" for k, v in meta["kinds"].most_common(4))
            print(f"   {d / iters:8.3f} ms  {n[:60]:60s}{extra[:120]}")


if __name__ == "__main__":
    main()
