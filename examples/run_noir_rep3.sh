#!/bin/sh
# Full co-noir pipeline, 3 parties over a TCP mesh (reference parity:
# co-noir/co-noir run scripts): split-input -> generate-witness (REP3
# ACVM) -> generate-proof (co-UltraHonk) -> create-vk -> verify.
# Usage: ./run_noir_rep3.sh [circuit-name] [workdir]
set -e
cd "$(dirname "$0")/.."
NAME=${1:-addition_multiplication}
TV=/root/reference/test_vectors/noir/$NAME
OUT=${2:-/tmp/cocircom_noir_demo}
mkdir -p "$OUT"

python -m cocircom_tpu.noir.cli split-input \
  --input "$TV/Prover.toml" --circuit "$TV/kat/$NAME.json" \
  --out-dir "$OUT"

for i in 0 1 2; do
  python -m cocircom_tpu.noir.cli generate-witness \
    --circuit "$TV/kat/$NAME.json" --input "$OUT/Prover.toml.$i.shared" \
    --net-config examples/configs/party$i.json \
    --out "$OUT/witness.$i.shared" &
done
wait

for i in 0 1 2; do
  python -m cocircom_tpu.noir.cli generate-proof \
    --circuit "$TV/kat/$NAME.json" --witness "$OUT/witness.$i.shared" \
    --net-config examples/configs/party$i.json \
    --out "$OUT/proof.$i.bin" &
done
wait

python -m cocircom_tpu.noir.cli create-vk \
  --circuit "$TV/kat/$NAME.json" --out "$OUT/vk.json"
python -m cocircom_tpu.noir.cli verify \
  --proof "$OUT/proof.0.bin" --vk "$OUT/vk.json"
cmp "$OUT/proof.0.bin" "$OUT/proof.1.bin" && cmp "$OUT/proof.0.bin" "$OUT/proof.2.bin"
echo "co-noir pipeline: shared inputs -> shared witness -> co-UltraHonk proof verified"
