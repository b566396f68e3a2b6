#!/bin/bash
# Run the full test suite (forced onto CPU with 8 virtual devices by
# tests/conftest.py; pytest.ini pins --capture=sys for sandboxed stdio).
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -q "$@"
