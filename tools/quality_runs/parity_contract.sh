#!/bin/bash
# Trained-checkpoint cross-framework parity (VERDICT-r3 item 1): the
# <=0.1 dB PSNR contract with TRAINED weights, both directions, for
# aninerf and sdf_pdf. See tools/parity_protocol.py for the design.
#
#   A) the reference's own train_net.py trains (CPU, tools/ref_cli.py
#      shims) -> its own run.py evaluates -> we import the .pth and
#      evaluate the same split -> |dPSNR| <= 0.1 dB.
#   B) our train_net.py trains (TPU) -> our run.py evaluates -> we
#      export to .pth -> the reference's own run.py evaluates it.
#
# Wall budget: the reference CPU trainings dominate (~1-2 h total on
# this 1-core box); everything else is minutes.
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
W=${PARITY_WORK:-/tmp/parity}
FAMILIES=${FAMILIES:-"aninerf sdf_pdf"}

python tools/parity_protocol.py gen --work $W
mkdir -p $W/ref $W/ours

for F in $FAMILIES; do
  CFG=$W/${F}_ref.yaml
  echo "=== [$F] A1: reference train_net.py (CPU) ==="
  python tools/ref_cli.py --work $W/ref train_net --cfg_file $CFG resume False
  echo "=== [$F] A2: reference run.py evaluate (its own checkpoint) ==="
  python tools/ref_cli.py --work $W/ref run --type evaluate --cfg_file $CFG
  echo "=== [$F] A3: import .pth -> our checkpoint dir ==="
  python tools/parity_protocol.py import-eval --work $W --family $F
  echo "=== [$F] A4: our run.py evaluate (imported weights) ==="
  (cd $W/ours && python /root/repo/run.py --type evaluate --cfg_file $CFG \
      exp_name parity_${F}_imported)

  echo "=== [$F] B1: our train_net.py (TPU) ==="
  (cd $W/ours && python /root/repo/train_net.py --cfg_file $CFG resume False \
      train.steps_per_dispatch 16)
  echo "=== [$F] B2: our run.py evaluate (our checkpoint) ==="
  (cd $W/ours && python /root/repo/run.py --type evaluate --cfg_file $CFG)
  echo "=== [$F] B3: export .flax -> reference .pth ==="
  python tools/parity_protocol.py export --work $W --family $F
  echo "=== [$F] B4: reference run.py evaluate (exported weights) ==="
  python tools/ref_cli.py --work $W/ref run --type evaluate --cfg_file $CFG \
      exp_name parity_${F}_tpu
done

echo "=== report ==="
python tools/parity_protocol.py report --work $W --families ${FAMILIES// /,}
