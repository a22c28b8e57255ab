#!/bin/sh
# 3-party co-Groth16 over a localhost TCP mesh (reference parity:
# co-circom/examples/groth16/run.sh). Usage: ./run_groth16_rep3.sh [workdir]
set -e
cd "$(dirname "$0")/.."
TV=/root/reference/test_vectors/Groth16/bn254/multiplier2
OUT=${1:-/tmp/cocircom_demo}
mkdir -p "$OUT"

python -m cocircom_tpu.cli split-witness \
  --witness "$TV/witness.wtns" --r1cs "$TV/circuit.r1cs" \
  --protocol rep3 --out-dir "$OUT"

for i in 0 1 2; do
  python -m cocircom_tpu.cli generate-proof groth16 \
    --zkey "$TV/circuit.zkey" \
    --witness "$OUT/witness.wtns.$i.shared" \
    --net-config examples/configs/party$i.json \
    --out "$OUT/proof.$i.json" --public-out "$OUT/public.$i.json" &
done
wait

python -m cocircom_tpu.cli verify groth16 \
  --proof "$OUT/proof.0.json" --vk "$TV/verification_key.json" \
  --public "$TV/public.json"
echo "3-party co-Groth16 proof verified"
