"""Summarize a jax.profiler/xprof trace: top device ops by self-time.

SURVEY.md §5 tracing subsystem — capture with the CLI `--trace DIR` (or
EOV_BENCH_TRACE for benches), then:

    python -m eov_tpu.tools.profile_summary DIR [--top 20]

Prints one line per op: self-time share of non-idle device time, total us,
occurrences. Requires the xprof/tensorboard-plugin-profile stack (present
in this environment; stub-gated otherwise).
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def summarize(trace_dir: str, top: int = 20) -> list[dict]:
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError as e:  # pragma: no cover - env-dependent
        raise SystemExit(f"xprof not available: {e}")

    files = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not files:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    rows = json.loads(data)[0].get("rows", [])

    ops = []
    idle = 0.0
    for r in rows:
        c = r["c"]
        if c[1]["v"] != "Device":
            continue
        name, total_self = c[3]["v"], float(c[7]["v"])
        if name == "IDLE":
            idle = total_self
            continue
        ops.append({
            "op": name,
            "self_us": total_self,
            "avg_us": float(c[8]["v"]),
            "occurrences": int(c[4]["v"]),
        })
    busy = sum(o["self_us"] for o in ops) or 1.0
    for o in ops:
        o["share_of_busy"] = o["self_us"] / busy
    ops.sort(key=lambda o: -o["self_us"])
    return [{"device_busy_us": busy, "device_idle_us": idle}] + ops[:top]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args(argv)
    rows = summarize(args.trace_dir, args.top)
    head = rows[0]
    busy, idle = head["device_busy_us"], head["device_idle_us"]
    print(f"device busy {busy/1e3:.2f} ms, idle {idle/1e3:.2f} ms "
          f"({busy/(busy+idle+1e-9)*100:.1f}% utilized)")
    for o in rows[1:]:
        # Long op names are jit-scope paths; the informative part is the
        # trailing op (keep the tail, not the shared prefix).
        name = o["op"]
        if len(name) > 90:
            name = "…" + name[-89:]
        print(f"{o['share_of_busy']*100:5.1f}%  {o['self_us']:>10.1f} us  "
              f"x{o['occurrences']:<5d} {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
