#!/usr/bin/env bash
# Round-4 VERDICT item 6: the layout-pinning probe matrix over the 1024²
# residual copy pool. One probe_layout.py invocation per variant — this
# environment's remote compile service wedges if one process compiles two
# same-signature/different-HLO programs (verify skill), so A/B always goes
# through separate processes. Appends one JSON line per variant to the
# results file; a failed variant records {"variant": ..., "error": ...}.
#
# Usage: tools/run_layout_probes.sh [results_file]   (default
#        train_result/layout_probes.jsonl; needs the real chip idle)
set -u
OUT="${1:-train_result/layout_probes.jsonl}"
mkdir -p "$(dirname "$OUT")"

run() { # run <variant> [extra args...]
    local variant="$1"; shift
    echo "[probes] $variant $* ..." >&2
    if ! timeout 900 python tools/probe_layout.py --variant "$variant" "$@" \
            >> "$OUT" 2> "/tmp/probe_${variant}_$$.err"; then
        python - "$variant" "/tmp/probe_${variant}_$$.err" <<'EOF' >> "$OUT"
import json, sys
err = open(sys.argv[2]).read().strip().splitlines()
print(json.dumps({"variant": sys.argv[1],
                  "error": (err[-1] if err else "timeout/no output")[:300]}))
EOF
    fi
    tail -1 "$OUT" >&2
}

run baseline
run img_entry
run img_entry_jit
run packed_imgs
run conv_in
# batch minor-most for conv inputs: the packed top-level convs are
# lane-bound (C=64 after packing); probing whether a different minor dim
# changes XLA's relayout choices.
run conv_in --m2m 0,3,2,1 --logdir /tmp/xprof_layout_conv_in_b
run params_entry
echo "[probes] done — $OUT" >&2
