#!/bin/bash
# GZSL valmargin at full strength (round-5 VERDICT item 5): the round-3
# recipe (augmentation + writer styles, docs/OCR_LOOP.md §5b.2) WITH the
# 20% train-vocabulary calibration holdout, two seeds, 0.01-step margin
# grid. One artifact must show ZSL >= 0.6 AND valmargin harmonic >= 0.5
# together. Match: /root/reference/ResPhoSCNetZSL/modules/engine.py:172-268.
#
# n_synth 2000 (not syn3's 1600): the holdout removes 20% of the train
# vocabulary, which is what dropped syn4's ZSL to 0.47 — re-running the
# syn3 recipe at n_synth 1600 + seed 0 reproduces syn4 BIT-FOR-BIT
# (verified this round), so "full strength" means restoring the TRAINED
# vocabulary to syn3's 160 words: 250-word vocab, 200-word train split,
# 40 held out for calibration -> 160 trained, 50-word unseen valid/test.
# --plateau_patience 12: the 250-word vocabulary (50 real unseen words
# after the round-5 word-list extension) learns slower in the first
# epochs than syn3's 200-word one; the reference's patience=5 tripped at
# epoch 7 and froze the run in the 7.5e-5 phase before the 3e-4 phase
# had done its work (syn3's entire 0 -> 0.64 climb happened at 3e-4).
set -e
cd "$(dirname "$0")/.."
for SEED in 0 1; do
  if [ "$SEED" = 0 ]; then DIR=runs/phosc_syn5; else DIR=runs/phosc_syn5_s$SEED; fi
  python -m worddiffusion_tpu.cli.train_phosc --mode train --synthetic 1 \
      --n_synth 2000 --renders_per_word 24 --writer_styles 1 --augment 40 \
      --epochs 80 --batch_size 64 --lr 3e-4 --save_dir "$DIR" \
      --plateau_patience 12 --calib_words_fraction 0.2 --seed "$SEED"
  python -m worddiffusion_tpu.cli.train_phosc --mode test --synthetic 1 \
      --n_synth 2000 --renders_per_word 24 --writer_styles 1 --augment 40 \
      --batch_size 64 --save_dir "$DIR" --seed "$SEED"
done
