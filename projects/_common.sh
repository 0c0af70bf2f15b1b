#!/bin/bash
# Shared launcher for the six reference workloads on TPU.
#
# The reference launches 8 processes via torchrun (one per GPU); on TPU a
# single process drives all chips of the host through the device mesh — no
# launcher needed. Multi-host slices: run this script once per host with
# JAX_COORDINATOR_ADDRESS set and pass --ddp.
RUN="python $(dirname "$0")/../run.py"
