# Developer entry points (no CI runner in this environment; these targets
# are the contract a CI would call).

PY ?= python

.PHONY: test test-fast bench suite check dryrun lint

test:            ## full suite on the virtual 8-CPU mesh (conftest forces it)
	$(PY) -m pytest tests/ -q

test-fast:       ## skip the slow neural/pipeline tests
	$(PY) -m pytest tests/ -q -k "not neural and not pipelines and not sd"

bench:           ## one-line JSON suite benchmark (needs the TPU)
	$(PY) bench.py

suite:           ## produce demo_assets/** at reference budgets
	$(PY) -m audio_inpainting_tpu all

check:           ## validate the artifact contract
	$(PY) -m audio_inpainting_tpu check

dryrun:          ## multi-chip sharding validation on a virtual CPU mesh
	$(PY) __graft_entry__.py 8
