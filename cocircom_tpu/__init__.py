"""cocircom_tpu — a TPU-native collaborative-SNARK (coSNARK) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TaceoLabs/collaborative-circom (reference mounted read-only at /root/reference):
N mutually-distrusting parties jointly produce a zero-knowledge proof over a
secret-shared witness, verifiable by unmodified snarkjs.

Layer map (TPU-first, mirrors reference SURVEY.md section 1):
  L0  ops/field.py, ops/curve.py   — limb-decomposed BN254/BLS12-381 arithmetic
  L1  ops/ntt.py, ops/msm.py       — NTT + Pippenger MSM (single chip + sharded)
  L2  mpc/                         — Plain / REP3 / Shamir protocol drivers
  L2' mpc/net.py                   — in-process + TCP party channels
  L3  io/                          — snarkjs artifact (de)serialization
  L4  vm/                          — circom witness-extension compiler + VM
  L5  snark/                       — co-Groth16 / co-PLONK provers, verifiers
  L6  cli.py                       — co-circom CLI parity
"""

__version__ = "0.1.0"
