#!/bin/bash
# Regenerate BENCH_FAMILIES.json: per-family whole-frame eval
# throughput via BENCH_MODEL runs of bench.py (VERDICT-r4 item 5b —
# the driver's bench artifact carries every family through the
# families_measured sidecar, not just the default AniNeRF).
# Run on the real chip from the repo root; ~15 min per family.
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
OUT=${OUT:-/tmp/bench_families}
mkdir -p $OUT
for M in aninerf sdf_pdf nerf_pdf neus_pdf; do
  echo "=== bench $M ==="
  BENCH_MODEL=$M python bench.py > $OUT/$M.json
done
python - <<'EOF'
import json, os
out_dir = os.environ.get("OUT", "/tmp/bench_families")
fams = {}
for m in ("aninerf", "sdf_pdf", "nerf_pdf", "neus_pdf"):
    d = json.load(open(f"{out_dir}/{m}.json"))
    det = d["detail"]
    fams[m] = {
        "rays_per_sec": d["value"],
        "median_ms_steady": det["median_ms"],
        "median_ms_single_dispatch": det["median_ms_single_dispatch"],
        "compute_dtype": det["compute_dtype"],
        "sec_per_1024sq_frame": det["sec_per_1024sq_frame"],
        "keep_frac": det["keep_frac"],
    }
blob = {
    "note": ("per-family whole-frame eval throughput measured via "
             "BENCH_MODEL runs of bench.py (262144 rays x 64 samples, "
             "steady-state marginal protocol, v5e). Attached to the "
             "default bench detail as families_measured; refresh with "
             "tools/quality_runs/bench_families.sh."),
    "device": json.load(open(f"{out_dir}/aninerf.json"))["detail"]["device"],
    "families": fams,
}
json.dump(blob, open("BENCH_FAMILIES.json", "w"), indent=1)
print("BENCH_FAMILIES.json written")
EOF
