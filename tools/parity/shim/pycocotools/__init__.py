"""Import-time stand-in for pycocotools (parity harness only)."""
