"""Command-line tools mirroring the reference binaries (juicer, gramgen,
lexgen, cdgen, hmmgen, genwfstseqs) plus the build-wfst pipeline."""
