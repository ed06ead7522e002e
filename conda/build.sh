#!/bin/bash
# Role of the reference's conda/build.sh (which runs make + pip installs the
# Cython interface): here the package is pure Python + a single C++ source
# compiled lazily at import, so the build is one pip install.
set -e
$PYTHON -m pip install . -vv --no-deps
