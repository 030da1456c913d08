#!/usr/bin/env bash
# TPU compiler-flag probe matrix over the two hot scales — the one
# remaining perf lever BASELINE.md's optimization log had never tried.
# Rationale: at 256^2 the residual ceiling is fusion/lane-bound conv time
# (BASELINE "speed-of-light audit"), and at 1024^2 a 22.9 ms/step copy
# pool remains; scoped-VMEM sizing and the latency-hiding scheduler are
# the two documented XLA/TPU knobs that change fusion sizing and op
# overlap without touching program semantics.
#
# Flags travel via `jit(compiler_options=...)` (profile_scale
# --compiler_option): local XLA_FLAGS carries NO TPU flags in this
# environment (compilation is remote; --xla_tpu_* aborts the process
# with "Unknown flags"), while compiler_options ship inside the compile
# request and are validated/applied by the remote compiler.
#
# One profile_scale.py process per variant (two same-signature but
# different-HLO compiles in one process wedge the remote compile service
# — verify skill), sequential, each bounded by `timeout`. Appends one
# JSON line per variant; failures record {"variant":..., "error":...}.
#
# Usage: tools/run_xla_flag_probes.sh [results_file]
#        (default evidence/xla_flag_probes.jsonl; needs the real chip idle)
set -u
OUT="${1:-evidence/xla_flag_probes.jsonl}"
mkdir -p "$(dirname "$OUT")"

run() { # run <variant> <scale> <batch> [--compiler_option k=v ...]
    local variant="$1" scale="$2" batch="$3"; shift 3
    echo "[flag-probes] s${scale} ${variant}: $* ..." >&2
    local err="/tmp/flagprobe_${variant}_s${scale}_$$.err"
    local out="/tmp/flagprobe_${variant}_s${scale}_$$.out"
    # stdout goes to a temp file and is appended ONLY on rc=0 — a process
    # that prints its JSON line but then dies (e.g. timeout during
    # shutdown) must not leave both a success-shaped row and an error row
    if timeout 900 python tools/profile_scale.py \
            --scale "$scale" --batch "$batch" --trace_steps 0 --json "$@" \
            > "$out" 2> "$err"; then
        # annotate the variant name onto the emitted JSON line
        python - "$out" "$variant" <<'EOF' >> "$OUT"
import json, sys
rec = json.loads(open(sys.argv[1]).read().splitlines()[-1])
rec.setdefault("variant", sys.argv[2])
print(json.dumps(rec))
EOF
    else
        python - "$variant" "$scale" "$err" <<'EOF' >> "$OUT"
import json, sys
err = open(sys.argv[3]).read().strip().splitlines()
print(json.dumps({"variant": sys.argv[1], "scale": int(sys.argv[2]),
                  "error": (err[-1] if err else "timeout/no output")[:300]}))
EOF
    fi
    rm -f "$out" "$err"
    tail -1 "$OUT" >&2
}

for sc_b in "6 16" "8 8"; do
    set -- $sc_b
    run baseline  "$1" "$2"
    run vmem64m   "$1" "$2" --compiler_option xla_tpu_scoped_vmem_limit_kib=65536
    run vmem96m   "$1" "$2" --compiler_option xla_tpu_scoped_vmem_limit_kib=98304
    run lhs_off   "$1" "$2" --compiler_option xla_tpu_enable_latency_hiding_scheduler=false
done
echo "[flag-probes] done — $OUT" >&2
