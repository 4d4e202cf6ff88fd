#!/usr/bin/env python3
"""MLST post-processing: turn perfect-search (`search -s -m`) output over an
MLST allele fasta into allele tables.

Reimplements workflows/MLST/process_MLST.py of the reference: allele fasta
headers are `<locus>_<allele>`; the search output's first column is that
header, second column the sample (hit). Produces:

  <prefix>.report.out    per-sample called/multiple counts
  <prefix>.raw.tsv       sample x locus allele table (NA for missing/multi)
  <prefix>.detailed.tsv  like raw but MULTI / NOT_CALLED distinguished
  <prefix>.clean.tsv     rows with <= 87 NA (Pasteur LM cgMLST heuristic)
  <prefix>.dropped.txt   samples dropped by the NA cutoff

Usage: process_mlst.py <search_output.tsv> <prefix>
"""

import sys
from collections import defaultdict


def main(argv: list[str]) -> None:
    infile, prefix = argv[1], argv[2]
    loci = set()
    rows = []
    with open(infile) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            locus, _, allele = parts[0].partition("_")
            loci.add(locus)
            rows.append((locus, allele.strip(), parts[1]))
    list_loci = sorted(loci)
    num_loci = len(list_loci)

    d: dict[str, dict[str, list[str]]] = defaultdict(dict)
    for locus, allele, sample in rows:
        d[sample].setdefault(locus, []).append(allele)

    with open(prefix + ".report.out", "w") as out:
        for sample in d:
            called = len(d[sample])
            multiple = sum(1 for a in d[sample].values() if len(a) > 1)
            out.write(
                f"{sample}; total: {called}/{num_loci}, multiple: {multiple}\n"
            )

    with open(prefix + ".raw.tsv", "w") as raw, open(
        prefix + ".detailed.tsv", "w"
    ) as det:
        header = "\t" + "\t".join(list_loci) + "\n"
        raw.write(header)
        det.write(header)
        for sample in d:
            r = [sample]
            dd = [sample]
            for locus in list_loci:
                a = d[sample].get(locus)
                if a is None:
                    r.append("NA")
                    dd.append("NOT_CALLED")
                elif len(a) == 1:
                    r.append(a[0])
                    dd.append(a[0])
                else:
                    r.append("NA")
                    dd.append("MULTI")
            raw.write("\t".join(r) + "\n")
            det.write("\t".join(dd) + "\n")

    with open(prefix + ".raw.tsv") as infile_f, open(
        prefix + ".clean.tsv", "w"
    ) as clean, open(prefix + ".dropped.txt", "w") as dropped:
        for line in infile_f:
            if line.rstrip("\n").split("\t").count("NA") > 87:
                dropped.write(line.rstrip("\n").split("\t")[0] + "\n")
            else:
                clean.write(line)


if __name__ == "__main__":
    main(sys.argv)
