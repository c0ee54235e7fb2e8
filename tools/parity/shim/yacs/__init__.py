"""yacs stand-in (parity harness only)."""
