# sift_tpu build / test / bench entry points
# (the reference drives everything through one Makefile, Makefile:25-48;
# here native code builds via csrc/, Python needs no build step)

.PHONY: all native test test-fast bench clean oracle readme

readme:
	python scripts/gen_readme.py

all: native

native:
	$(MAKE) -C csrc

test: native
	python -m pytest tests/ -x -q

test-fast: native
	python -m pytest tests/ -x -q -k "not e2e and not parity"

bench:
	python bench.py

oracle:
	bash tests/oracle/build.sh

clean:
	$(MAKE) -C csrc clean
