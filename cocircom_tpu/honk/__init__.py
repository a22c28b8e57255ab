"""UltraHonk (plain) and co-UltraHonk — the Barretenberg-compatible Honk
proof system family behind co-noir.

Parity map (reference -> here):
  /root/reference/co-noir/ultrahonk/src/transcript.rs      -> transcript.py
  /root/reference/co-noir/ultrahonk/src/parse/builder.rs   -> builder.py
  /root/reference/co-noir/ultrahonk/src/parse/proving_key.rs -> proving_key.py
  /root/reference/co-noir/ultrahonk/src/oink/              -> oink.py
  /root/reference/co-noir/ultrahonk/src/decider/           -> sumcheck.py, zeromorph.py, relations.py
  /root/reference/co-noir/ultrahonk/src/prover.rs          -> prover.py
"""
