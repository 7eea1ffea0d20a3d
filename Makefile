.PHONY: test test-fast bench benchmarks native native-asan dryrun clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not pipeline and not cli"

bench:
	python bench.py

benchmarks:
	python benchmarks/run_benchmarks.py

native:
	python -m ssip_tpu.native.build

native-asan:
	python -m ssip_tpu.native.build --sanitize address

dryrun:
	python __graft_entry__.py

clean:
	rm -rf outputs/cache .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
