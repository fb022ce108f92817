#!/bin/bash
# Read-mapping sweeps over diet patterns, mirroring
# ReproducibleEvaluation/ReadMapping/Read-mapping-real-data-{Illumina,HiFi,ONT}.sh
# (the reference's commands at README.md:41-47), driven through the gdiet CLI.
#
# Usage: eval/read_mapping_sweep.sh <ref.fa> <illumina.fq> [hifi.fq] [ont.fq]
set -e
REF=$1; ILMN=$2; HIFI=$3; ONT=$4
OUT=${OUT:-/tmp/gdiet_eval}
mkdir -p "$OUT"

run() {
  local tag=$1; shift
  echo "== $tag: gdiet $*" >&2
  /usr/bin/time -v python -m gdiet_tpu "$@" 2> "$OUT/$tag.time" > "$OUT/$tag.sam"
  local mapped=$(awk '!/^@/ && !and($2,4)' "$OUT/$tag.sam" | wc -l)
  local total=$(awk '!/^@/' "$OUT/$tag.sam" | wc -l)
  local secs=$(grep "Elapsed" "$OUT/$tag.time" | awk '{print $8}')
  echo "$tag records=$total mapped=$mapped wall=$secs"
}

for Z in 11 10 110 1110; do
  W=${#Z}
  run "illumina_Z$Z" -a -t 1 -x sr -Z "$Z" -W "$W" -k 21 -w 11 -i 2 -N 1 \
      -r 0.05,150,200 -n 0.95,0.3 -s 100 --AF_max_loc 2 "$REF" "$ILMN"
done

if [ -n "$HIFI" ]; then
  for Z in 11 10; do
    W=${#Z}
    run "hifi_Z$Z" -a -t 1 -x map-hifi -Z "$Z" -W "$W" -k 19 -w 19 -i 0.2 \
        -r 1000 --vt_dis=650 --vt_nb_loc=5 --vt_df1=0.0106 --vt_df2=0.2 \
        -s 400 --vt_cov 0.04 --vt_f=0.04 "$REF" "$HIFI"
  done
fi

if [ -n "$ONT" ]; then
  # ultralong reads are pre-split to 30 kb segments (Read-mapping-real-data-ONT.sh:16)
  python eval/ultralong_read_splitter.py "$ONT" 30000 > "$OUT/ont_split.fq"
  for Z in 11 10; do
    W=${#Z}
    run "ont_Z$Z" -a -t 1 -x map-ont -Z "$Z" -W "$W" -k 15 -w 10 -r 1300 \
        --vt_dis=1000 --vt_nb_loc=3 --vt_df1=0.007 --vt_df2=0.007 -s 35000 \
        --vt_cov 0.3 "$REF" "$OUT/ont_split.fq"
  done
fi
