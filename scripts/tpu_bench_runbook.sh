#!/usr/bin/env bash
# One-shot TPU measurement sweep (run with the host otherwise idle; one
# TPU client at a time). Each stage writes /tmp/tpu_bench/<stage>.log and
# the JSON lines land in /tmp/tpu_bench/summary.jsonl (fresh each run).
#
#   bash scripts/tpu_bench_runbook.sh [stage ...]
#
# Stages (default: all, in this order; summary.jsonl is truncated per run):
#   selftest    on-chip Pallas/XLA kernel parity incl. int8 (~12 min)
#   generate    bf16 + int8 decode A/B + diverse beam      (~15 min)
#   bci         BCI LoRA fine-tune step                    (~12 min)
#   bci_int8    same with int8 frozen base                 (~12 min)
#   generate7b  TRUE 7B dims served from int8, one chip    (~20+ min)
#   default     the full driver bench (headline JSON)      (~35 min)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_bench
mkdir -p "$OUT"
: > "$OUT/summary.jsonl"   # fresh summary per run (stage logs overwrite too)
STAGES=${@:-"selftest generate bci bci_int8 generate7b default"}

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  # -k 60: escalate to SIGKILL — the trainer's preemption handler treats a
  # bare SIGTERM as a checkpoint-and-continue notice
  timeout -k 60 3600 "$@" 2>&1 | tee "$OUT/$name.log" | tail -3
  grep -h "^{" "$OUT/$name.log" | tail -1 >> "$OUT/summary.jsonl" || true
}

for s in $STAGES; do
  case $s in
    selftest)   run selftest   python bench.py --selftest ;;
    generate)   run generate   python bench.py --workload generate ;;
    bci)        run bci        python bench.py --workload bci ;;
    bci_int8)   run bci_int8   python bench.py --workload bci --int8 ;;
    generate7b) run generate7b python bench.py --workload generate7b ;;
    default)    run default    python bench.py ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "=== summary ==="
cat "$OUT/summary.jsonl"
