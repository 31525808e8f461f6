#!/usr/bin/env python
"""Entry point: python driver_qm.py parameters.in (cf. src/driver_qm.cc)."""
import sys

from mlmcpathintegral_tpu.drivers.qm import main

if __name__ == "__main__":
    sys.exit(main())
