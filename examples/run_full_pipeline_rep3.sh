#!/bin/sh
# The COMPLETE privacy-preserving pipeline with two independent input
# providers (reference parity: co-circom/examples/groth16/run_full_with_merge.sh):
#   split-input (per provider) -> merge-input-shares (per party) ->
#   generate-witness REP3 (3-process TCP mesh; no cleartext witness) ->
#   generate-proof REP3 -> verify.
# Usage: ./run_full_pipeline_rep3.sh [workdir]
set -e
cd "$(dirname "$0")/.."
EX=/root/reference/co-circom/co-circom/examples/groth16/test_vectors/multiplier2
OUT=${1:-/tmp/cocircom_full_demo}
mkdir -p "$OUT"

# input provider 0 holds {"a": 3}; provider 1 holds the public {"b": 11}
python -m cocircom_tpu.cli split-input \
  --circuit "$EX/circuit.circom" --input "$EX/input0.json" \
  --protocol rep3 --out-dir "$OUT"
python -m cocircom_tpu.cli split-input \
  --circuit "$EX/circuit.circom" --input "$EX/input1.json" \
  --protocol rep3 --out-dir "$OUT"

for i in 0 1 2; do
  python -m cocircom_tpu.cli merge-input-shares \
    "$OUT/input0.json.$i.shared" "$OUT/input1.json.$i.shared" \
    --out "$OUT/input.json.$i.shared"
done

for i in 0 1 2; do
  python -m cocircom_tpu.cli generate-witness \
    --circuit "$EX/circuit.circom" --input "$OUT/input.json.$i.shared" \
    --protocol rep3 --net-config examples/configs/party$i.json \
    --out "$OUT/witness.wtns.$i.shared" &
done
wait

for i in 0 1 2; do
  python -m cocircom_tpu.cli generate-proof groth16 \
    --zkey "$EX/multiplier2.zkey" \
    --witness "$OUT/witness.wtns.$i.shared" \
    --net-config examples/configs/party$i.json \
    --out "$OUT/proof.$i.json" --public-out "$OUT/public.$i.json" &
done
wait

python -m cocircom_tpu.cli verify groth16 \
  --proof "$OUT/proof.0.json" --vk "$EX/verification_key.json" \
  --public "$OUT/public.0.json"
echo "full MPC pipeline: input shares -> witness shares -> proof verified"
