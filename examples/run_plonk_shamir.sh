#!/bin/sh
# 3-party co-PLONK under Shamir(3, t=1) over a localhost TCP mesh
# (reference parity: co-circom/examples/plonk + the shamir configs).
# Usage: ./run_plonk_shamir.sh [workdir]
set -e
cd "$(dirname "$0")/.."
TV=/root/reference/test_vectors/Plonk/bn254/multiplier2
OUT=${1:-/tmp/cocircom_plonk_shamir}
mkdir -p "$OUT"

python -m cocircom_tpu.cli split-witness \
  --witness "$TV/witness.wtns" --r1cs "$TV/circuit.r1cs" \
  --protocol shamir --out-dir "$OUT"

for i in 0 1 2; do
  python -m cocircom_tpu.cli generate-proof plonk \
    --zkey "$TV/circuit.zkey" \
    --witness "$OUT/witness.wtns.$i.shared" \
    --net-config examples/configs/party$i.json \
    --out "$OUT/proof.$i.json" --public-out "$OUT/public.$i.json" &
done
wait

python -m cocircom_tpu.cli verify plonk \
  --proof "$OUT/proof.0.json" --vk "$TV/verification_key.json" \
  --public "$TV/public.json"
echo "3-party Shamir co-PLONK proof verified"
