#!/bin/sh
# Build the reference's tree-gravity path single-rank for baseline
# measurement.  Reference sources are compiled UNMODIFIED from
# /root/reference (read-only); MPI/pfft come from ./stubs.
set -e
cd "$(dirname "$0")"
REF=/root/reference
OUT=build
mkdir -p $OUT

CFLAGS="-O3 -fopenmp -I stubs -I $REF -I $REF/libgadget \
  -DVALGRIND -w -std=gnu11"
# -DVALGRIND: makes mymalloc use plain malloc per allocation instead of
# one big static arena (utils/memory.c), so no tuning of arena size.

SRCS="$REF/libgadget/forcetree.c \
  $REF/libgadget/treewalk.c \
  $REF/libgadget/gravshort-tree.c \
  $REF/libgadget/gravity.c \
  $REF/libgadget/partmanager.c \
  $REF/libgadget/walltime.c \
  $REF/libgadget/utils/endrun.c \
  $REF/libgadget/utils/mymalloc.c \
  $REF/libgadget/utils/memory.c \
  $REF/libgadget/utils/system.c \
  $REF/libgadget/utils/event.c \
  $REF/libgadget/utils/peano.c \
  $REF/libgadget/utils/string.c \
  $REF/libgadget/utils/spinlocks.c \
  $REF/libgadget/utils/openmpsort.c \
  $REF/libgadget/utils/paramset.c \
  $REF/libgadget/slotsmanager.c"

gcc $CFLAGS ref_tree_bench.c shims.c stubs/mpi_stub.c stubs/gsl_rng_stub.c $SRCS -o $OUT/ref_tree_bench -lm
echo "built $OUT/ref_tree_bench"
