"""CRS for UltraHonk commitments.

The reference loads the Aztec Ignition BN254 setup from ~/.bb-crs g1/g2
.dat files (parse/crs.rs:44-66; the 6 GB g1.dat is NOT committed to the
repo, only bn254_g2.dat is). This build therefore supports two modes:

1. TestCrs — an INSECURE locally-generated setup with a known tau
   (deterministic, for tests/benches). Knowing tau makes commitment a
   polynomial evaluation + ONE scalar mul instead of an n-point MSM:
   commit(f) = f(tau)·G1. Proofs verify with the matching g2_x = tau·G2
   but anyone knowing tau can forge openings — never use in production.
2. FileCrs — real setup points from .dat files (g1: 64-byte uncompressed
   big-endian x||y per point, g2: single 128-byte point; format per
   crs.rs read_transcript_g1/g2). Commitment = MSM over the points
   (routed through the TPU MSM engine for large n).
"""

from __future__ import annotations

import hashlib

from ..fields.ec_host import ec_add, ec_mul
from ..fields.params import BN254
from ..pairing.tower import Fp, Fp2

P_FQ = BN254.fq.p
P_FR = BN254.fr.p


def _g1_gen():
    return (Fp(1, P_FQ), Fp(2, P_FQ))


def _g2_gen():
    c = BN254.g2_gen
    return (
        Fp2(Fp(c[0][0], P_FQ), Fp(c[0][1], P_FQ)),
        Fp2(Fp(c[1][0], P_FQ), Fp(c[1][1], P_FQ)),
    )


class TestCrs:
    """Known-tau test setup. commit(poly) = poly(tau)*G1 (exactly equal to
    the MSM over monomial powers tau^i * G1 — same group element)."""

    def __init__(self, seed: bytes = b"cocircom-tpu insecure test crs"):
        self.tau = int.from_bytes(hashlib.sha512(seed).digest(), "little") % P_FR
        self.g1 = _g1_gen()
        self.g2_gen = _g2_gen()
        self.g2_x = ec_mul(self.g2_gen, self.tau)

    def commit(self, poly) -> tuple | None:
        """poly: list of int coefficients -> affine G1 point (or None=inf)."""
        acc = 0
        for c in reversed(poly):
            acc = (acc * self.tau + c) % P_FR
        if acc == 0:
            return None
        return ec_mul(self.g1, acc)


def g1_point_to_ints(pt) -> tuple[int, int] | None:
    if pt is None:
        return None
    return (pt[0].v, pt[1].v)


def read_g2_dat(path: str):
    """bn254_g2.dat: 128 bytes big-endian x.c0 x.c1 y.c0 y.c1 (crs.rs
    read_transcript_g2 new-format branch)."""
    raw = open(path, "rb").read()
    if len(raw) < 128:
        raise ValueError("g2.dat too small")
    vals = [int.from_bytes(raw[i * 32:(i + 1) * 32], "big") for i in range(4)]
    x = Fp2(Fp(vals[0], P_FQ), Fp(vals[1], P_FQ))
    y = Fp2(Fp(vals[2], P_FQ), Fp(vals[3], P_FQ))
    return (x, y)
