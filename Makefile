# aacjax top-level targets
.PHONY: all native test test-cpu bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -x -q

# full suite on CPU with an 8-virtual-device mesh (sharding tests included)
test-cpu: native
	bash scripts/test_cpu.sh

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
