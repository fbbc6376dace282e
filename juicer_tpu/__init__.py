"""juicer_tpu — a TPU-native WFST LVCSR decoding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Juicer
LVCSR decoder (reference surveyed in SURVEY.md): offline knowledge-source
compilation (ARPA LM + pronunciation lexicon + HTK HMM/GMM acoustic models
-> composed CLG transducer as flat CSR arc arrays), dense batched
log-Gaussian-mixture acoustic scoring on the MXU, and a time-synchronous
Viterbi beam-search decoder implemented as dense masked frontier expansion
with segment-max recombination under `jax.lax.scan`.

Subpackages
-----------
fst      : weighted finite-state transducer library (compose/determinize/...)
lm       : ARPA n-gram and word-pair language model readers
lexicon  : vocabulary, pronunciation lexicon, phone sets
am       : HTK MMF acoustic models, flat GMM packing, hybrid LNA scoring
compile  : G/L/C/H transducer generation and CLG build pipeline
decoder  : reference (numpy oracle) and TPU (lax.scan) decoder cores
harness  : batch decoding harness, WER scoring, output formats, feature IO
parallel : device-mesh utilities for multi-chip / multi-host scale-out
ops      : Pallas TPU kernels
cli      : command-line tools mirroring the reference binaries
"""

__version__ = "0.1.0"
