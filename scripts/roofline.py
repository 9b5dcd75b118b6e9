"""Anchor measured decode throughput to v5e physics: HBM-bandwidth % and
MXU-FLOP % per benched configuration.

Single-chip decode is HBM-bound: every step streams the full weight set
(plus live KV) once, so

    step_time >= bytes_per_step / BW_peak
    tok/s     <= compression * BW_peak / bytes_per_step

The lookahead composite multiplies per-step matmul FLOPs by its row count S
while weight *bytes* stay constant — speedup therefore requires the extra
arithmetic intensity to stay under the MXU ceiling AND the compression to
pay back the rows. This script turns bench.py output into that table:

    python scripts/roofline.py BENCH_r03.json   # or any bench JSON line

v5e peaks: 819 GB/s HBM, 197 bf16 TFLOP/s (394 int8 TOPS).
"""

import json
import sys

V5E_BW = 819e9          # bytes/s
V5E_BF16 = 197e12       # FLOP/s
KV_BYTES = 2            # bf16 cache entries (int8_kv halves this)


def arch_params(hidden, inter, layers, heads, kv_heads, vocab=32000,
                head_dim=None):
    d = head_dim or hidden // heads
    attn = hidden * heads * d + 2 * hidden * kv_heads * d + heads * d * hidden
    mlp = 3 * hidden * inter
    return dict(layer=attn + mlp, layers=layers, lm_head=hidden * vocab,
                hidden=hidden, kv_heads=kv_heads, head_dim=d, vocab=vocab)


ARCHS = {
    "1.1b": arch_params(2048, 5632, 22, 32, 4),
    "3b": arch_params(3072, 11264, 24, 24, 8),
    "7b": arch_params(4096, 11008, 32, 32, 32),
}


def step_cost(arch, s_rows, kv_live, wbits=16, lm_bits=None, kv_bytes=KV_BYTES):
    """(bytes_read, matmul_flops) of one decode step with S composite rows."""
    lm_bits = lm_bits or wbits
    proj = arch["layer"] * arch["layers"]
    wbytes = proj * wbits / 8 + arch["lm_head"] * lm_bits / 8
    kvb = (2 * arch["layers"] * arch["kv_heads"] * arch["head_dim"]
           * kv_live * kv_bytes)
    flops = 2 * (proj + arch["lm_head"]) * s_rows
    # attention dots: QK^T + PV over the live context, 2 FLOPs/MAC, summed
    # over all q heads (heads * head_dim = hidden)
    flops += 4 * s_rows * kv_live * arch["hidden"]
    return wbytes + kvb, flops


def composite_rows(level, window, guess):
    # core/layout.py: S = (N-1)*W + G*GS with GS = N-1
    return (level - 1) * window + guess * (level - 1)


def row(label, arch, lcfg, tok_s, compression, wbits=16, lm_bits=None,
        kv_bytes=KV_BYTES, kv_live=192):
    s = composite_rows(*lcfg) if lcfg else 1
    comp = compression if lcfg else 1.0
    b, f = step_cost(ARCHS[arch], s, kv_live, wbits, lm_bits, kv_bytes)
    steps_s = tok_s / comp
    return {
        "config": label,
        "tok_s": tok_s,
        "S_rows": s,
        "bytes_per_step_GB": round(b / 1e9, 3),
        "HBM_BW_pct": round(100 * b * steps_s / V5E_BW, 1),
        "MFU_pct": round(100 * f * steps_s / V5E_BF16, 1),
    }


def from_bench_json(path):
    import os
    with open(path) as f:
        data = json.load(f)
    data = data.get("parsed") or data     # driver BENCH_rNN.json wrapper
    if "detail_file" in data and "detail" not in data:
        # round-4 compact stdout line: full detail lives in a side file
        dpath = os.path.join(os.path.dirname(os.path.abspath(path)),
                             data["detail_file"])
        if not os.path.exists(dpath):
            dpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "..", data["detail_file"])
        with open(dpath) as f:
            data = json.load(f)
    d = data.get("detail", data)
    rows = []

    def pair(label, res, arch, lcfg, wbits=16, lm_bits=None,
             kv_bytes=KV_BYTES):
        if not isinstance(res, dict) or "lade_tokens_per_sec" not in res:
            return
        rows.append(row(f"{label} AR", arch, None, res["ar_tokens_per_sec"],
                        1.0, wbits, lm_bits, kv_bytes))
        rows.append(row(f"{label} LADE", arch, lcfg,
                        res["lade_tokens_per_sec"], res["compression_ratio"],
                        wbits, lm_bits, kv_bytes))

    pair("headline bf16 L7/W20/G20", d, "1.1b", (7, 20, 20))
    v = d.get("variants", {})
    for band, bname in (("realistic_compression", "realistic-mid"),
                        ("realistic_upper_band", "realistic-upper")):
        rc = v.get(band, {})
        if not isinstance(rc, dict):
            continue
        pair(f"{bname} L7/W20/G20", rc.get("demo_config_L7W20G20"),
             "1.1b", (7, 20, 20))
        for sub, wb, lb in (("tuned_config", 16, None),
                            ("tuned_int8", 8, 8)):
            t = rc.get(sub)
            if isinstance(t, dict) and "config" in t:
                c = t["config"]
                tag = "int8 " if wb == 8 else ""
                pair(f"{bname} {tag}tuned L{c['level']}/W{c['window_size']}"
                     f"/G{c['guess_set_size']}", t, "1.1b",
                     (c["level"], c["window_size"], c["guess_set_size"]),
                     wbits=wb, lm_bits=lb)
    pair("int8_kv L7/W20/G20", v.get("int8_kv"), "1.1b", (7, 20, 20),
         kv_bytes=1)
    pair("int8 L7/W20/G20", v.get("int8_weights"), "1.1b", (7, 20, 20),
         wbits=8, lm_bits=8)
    pair("int4 L7/W20/G20", v.get("int4_weights"), "1.1b", (7, 20, 20),
         wbits=4, lm_bits=8)
    for scale, akey in (("7b", "quant_ordering_7b"), ("3b", "quant_ordering_3b")):
        q = v.get(akey, {})
        if isinstance(q, dict):
            for nm, wb in (("int4", 4), ("int8", 8)):
                pair(f"{scale} {nm} L5/W7/G7", q.get(nm), scale, (5, 7, 7),
                     wbits=wb, lm_bits=8)
    pair("7b bf16 L5/W7/G7", v.get("7b_bf16"), "7b", (5, 7, 7))
    return rows


def to_markdown(rows):
    out = ["| config | tok/s | S rows | GB/step | HBM BW % | MFU % |",
           "|---|---|---|---|---|---|"]
    for r in rows:
        out.append(f"| {r['config']} | {r['tok_s']} | {r['S_rows']} | "
                   f"{r['bytes_per_step_GB']} | {r['HBM_BW_pct']} | "
                   f"{r['MFU_pct']} |")
    return "\n".join(out)


if __name__ == "__main__":
    rows = from_bench_json(sys.argv[1])
    print(to_markdown(rows))
