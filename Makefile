# Common targets. Tests force the CPU platform with a virtual 8-device mesh.
PY ?= python

.PHONY: test bench native lint dryrun

test:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

native:
	$(PY) -c "from wafer_tpu import native; assert native.available(); print('native codecs OK')"

dryrun:
	$(PY) __graft_entry__.py 8

lint:
	$(PY) -m compileall -q wafer_tpu tests
