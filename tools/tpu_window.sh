#!/bin/bash
# Round-end TPU window sequencing (run AFTER the trainer has exited).
# One process at a time on the chip; each step leaves committable
# artifacts.  Usage: bash tools/tpu_window.sh [eval_dir]
set -e
cd "$(dirname "$0")/.."
EVAL_DIR=${1:-docs/eval_r5}

if pgrep -f train_corpus.py > /dev/null; then
    echo "trainer still running - stop it first (SIGINT by PID)"; exit 1
fi

echo "== 1. bench (warms compile cache incl. two-stage programs) =="
timeout 1800 python bench.py 2> /tmp/bench_r5.err | tee /tmp/bench_r5.json
tail -3 /tmp/bench_r5.err

echo "== 2. wire vs device decomposition (+ two-stage overlap) =="
timeout 1200 python tools/wire_vs_device.py 2> /tmp/wire_r5.err \
    | tee /tmp/wire_r5.json

echo "== 3a. eval protocol, 19 images (soccer isolated to its own proc) =="
LLICTI_EVAL_SKIP=soccer_41f8d8ab.png \
timeout 5400 python tools/eval_protocol.py "$EVAL_DIR"

echo "== 4. per-scale breakdown vs reference (main-run table, before =="
echo "==    the soccer append adds its own single-image table) =="
python tools/scale_breakdown.py "$EVAL_DIR/eval_log.txt" \
    "$EVAL_DIR/BREAKDOWN.md"

echo "== 3b. soccer family on-TPU via pad-to-bucket (separate process =="
echo "==     so a worker crash cannot damage the main run) =="
if ! LLICTI_EVAL_APPEND=1 LLICTI_EVAL_ONLY=soccer_41f8d8ab.png \
     LLICTI_EVAL_BUCKET=soccer_41f8d8ab.png \
     timeout 1800 python tools/eval_protocol.py "$EVAL_DIR"; then
    echo "bucketed TPU attempt failed -> CPU-backend fallback entry"
    LLICTI_EVAL_APPEND=1 LLICTI_EVAL_ONLY=soccer_41f8d8ab.png \
    LLICTI_EVAL_PLATFORM=cpu \
    timeout 3600 python tools/eval_protocol.py "$EVAL_DIR"
fi

echo "== 5. attach checkpoint meta + train log =="
cp bench_ckpt/bench.meta.json "$EVAL_DIR/checkpoint.meta.json"
cp experiments/corpus_run/train_log.jsonl "$EVAL_DIR/train_log_r5.jsonl" \
    || true
echo "done - review $EVAL_DIR, update README/STATUS, commit with ckpt"
