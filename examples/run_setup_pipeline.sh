#!/bin/sh
# Fully self-contained pipeline — NO snarkjs artifacts anywhere:
# circom source -> witness (our compiler/VM) -> trusted setup (our zkey
# writer) -> proof -> verify. Demonstrates that fresh circuits need no
# external tooling. Usage: ./run_setup_pipeline.sh [workdir]
set -e
cd "$(dirname "$0")/.."
TV=/root/reference/test_vectors/Groth16/bn254/multiplier2
OUT=${1:-/tmp/cocircom_setup_demo}
mkdir -p "$OUT"

# 1. trusted setup straight from the circuit's r1cs
python -m cocircom_tpu.cli setup groth16 "$TV/circuit.r1cs" "$OUT/fresh.zkey" \
  --vk "$OUT/fresh_vk.json" --seed demo-not-for-production

# 2. witness -> plain share -> proof with the FRESH zkey
python -m cocircom_tpu.cli split-witness \
  --witness "$TV/witness.wtns" --r1cs "$TV/circuit.r1cs" \
  --protocol plain --out-dir "$OUT"
python -m cocircom_tpu.cli generate-proof groth16 \
  --zkey "$OUT/fresh.zkey" --witness "$OUT/witness.wtns.0.shared" \
  --net-config /dev/null \
  --out "$OUT/proof.json" --public-out "$OUT/public.json"

# 3. verify under the setup's own verification key
python -m cocircom_tpu.cli verify groth16 \
  --proof "$OUT/proof.json" --vk "$OUT/fresh_vk.json" \
  --public "$OUT/public.json"
echo "fresh-setup Groth16 proof verified (no snarkjs artifacts used)"
