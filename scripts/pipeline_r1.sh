#!/bin/bash
# Round-1 training pipeline: serialized TPU work (datagen + training per suite/model),
# highest-value items first. Touch runs/STOP to halt between stages.
set -u
cd /root/repo
W=runs
RUN="python -m blindno.suites.run --workdir $W"
mkdir -p $W/logs

step() {
  if [ -f $W/STOP ]; then echo "STOP marker found, exiting"; exit 0; fi
  echo "=== $(date +%H:%M:%S) $* ==="
  "$@" >> $W/logs/pipeline.log 2>&1 || echo "FAILED: $*" | tee -a $W/logs/pipeline.log
}

# 1) 1D FPE: fast datagen, three models
step $RUN --suite fpe1d --stage datagen
step $RUN --suite fpe1d --model nio --stage train
step $RUN --suite fpe1d --model fno --stage train
step $RUN --suite fpe1d --model unet --stage train

# 2) 2D FPE: the benchmark suite
step $RUN --suite fpe2d --stage datagen
step $RUN --suite fpe2d --model nio --stage train
step $RUN --suite fpe2d --model unet --stage train
step $RUN --suite fpe2d --model fno --stage train

# 3) Schrodinger
step $RUN --suite schrodinger1d --stage datagen
step $RUN --suite schrodinger1d --model nio --stage train
step $RUN --suite schrodinger1d --model fno --stage train
step $RUN --suite schrodinger1d --model unet --stage train

# 4) GPE
step $RUN --suite gpe1d --stage datagen
step $RUN --suite gpe1d --model nio --stage train
step $RUN --suite gpe1d --model fno --stage train
step $RUN --suite gpe1d --model unet --stage train

# 5) NC 2D
step $RUN --suite ncfpe2d --stage datagen --m 1200
step $RUN --suite ncfpe2d --model nio --stage train
step $RUN --suite ncfpe2d --model unet --stage train
step $RUN --suite ncfpe2d --model fno --stage train

# 6) GPE (V, g, kappa) long run
step $RUN --suite gpe1d_vgk --model nio --stage train

echo "pipeline complete $(date)"
