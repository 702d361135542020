#!/bin/bash
# Retry-forever wrapper (≡ the reference's scripts/run.sh): relaunch training
# on crash; paired with automatic checkpoint resume this gives
# checkpoint-granularity fault tolerance.
until "$@"; do echo retrying; done
