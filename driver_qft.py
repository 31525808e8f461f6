#!/usr/bin/env python
"""Entry point: python driver_qft.py parameters.in (cf. src/driver_qft.cc)."""
import sys

from mlmcpathintegral_tpu.drivers.qft import main

if __name__ == "__main__":
    sys.exit(main())
