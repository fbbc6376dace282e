"""juicer CLI: the batch decoder driver.

Mirrors `/root/reference/src/juicer.cpp`: loads vocabulary, acoustic models
(HTK MMF or hybrid priors), the composed network (with LM scale / insertion
penalty baked in at load), checks resource consistency, builds a decoder
core (TPU frontier engine by default, `-refCore` for the numpy oracle
token-passing core), and runs the batch harness with WER/RTF reporting.

Binary caching (`-writeBinaryFiles`): the parsed network and models are
cached as .npz next to their sources and auto-loaded when newer
(`juicer.cpp:777-802,852-890` analogue).
"""

import argparse
import os
import sys

import numpy as np


def make_parser():
    p = argparse.ArgumentParser(prog="jtpu-juicer", description=__doc__)
    # resources
    p.add_argument("-lexFName", required=True)
    p.add_argument("-sentStartWord", default=None)
    p.add_argument("-sentEndWord", default=None)
    p.add_argument("-fsmFName", required=True)
    p.add_argument("-inSymsFName", required=True)
    p.add_argument("-outSymsFName", required=True)
    p.add_argument("-htkModelsFName", default=None)
    p.add_argument("-monoListFName", default=None)
    p.add_argument("-priorsFName", default=None)
    p.add_argument("-statesPerModel", type=int, default=0)
    # decoding parameters
    p.add_argument("-lmScaleFactor", type=float, default=1.0)
    p.add_argument("-insPenalty", type=float, default=0.0)
    p.add_argument("-mainBeam", type=float, default=0.0, help="emitting-state beam width")
    p.add_argument("-phoneStartBeam", type=float, default=0.0)
    p.add_argument("-phoneEndBeam", type=float, default=0.0)
    p.add_argument("-wordEmitBeam", type=float, default=0.0)
    p.add_argument("-maxHyps", type=int, default=0, help="histogram pruning top-N")
    p.add_argument("-refCore", action="store_true", help="use the numpy oracle core")
    p.add_argument("-maxInsts", type=int, default=8192)
    p.add_argument("-expandBudget", type=int, default=32768)
    p.add_argument("-batchSize", type=int, default=1, help="utterances decoded per device batch")
    # input / output
    p.add_argument("-inputFName", default=None,
                   help="list of feature files (not needed with -loop)")
    p.add_argument("-inputFormat", default="htk",
                   choices=["htk", "lna", "npy", "factory"])
    p.add_argument("-framesPerSec", type=float, default=100.0)
    p.add_argument("-outputFName", default=None)
    p.add_argument("-outputFormat", default="verbose",
                   choices=["ref", "trans", "mlf", "xmlf", "verbose"])
    p.add_argument("-refFName", default=None)
    p.add_argument("-removeSentMarks", action="store_true")
    p.add_argument("-writeBinaryFiles", action="store_true")
    p.add_argument("-logFName", default=None)
    p.add_argument("-latticeDir", default=None, help="write per-utterance lattices here")
    p.add_argument("-modelLevelOutput", action="store_true",
                   help="output model (phone) sequences instead of words")
    # speaker adaptation: per-speaker CMLLR input transforms
    p.add_argument("-inputXformDir", default=None)
    p.add_argument("-inputXformExt", default=".xform")
    p.add_argument("-speakerNamePattern", default=None,
                   help="regex with one capture group extracting the speaker "
                        "from the utterance name")
    # model-space MLLR with regression classes (the reference reaches this
    # via HTKLib HAdapt config through HModels; here it is a flag pair)
    p.add_argument("-mllrXformFile", default=None,
                   help="HTK transform file (MLLRMEAN <XFORMSET>) applied to "
                        "the Gaussian means at load time")
    p.add_argument("-regClassFile", default=None,
                   help="HTK ~b base-class file assigning mixture components "
                        "to regression classes for -mllrXformFile")
    p.add_argument("-doModelsIOTest", action="store_true",
                   help="round-trip the acoustic models through text and "
                        "binary formats and verify scores agree")
    p.add_argument("-genTestSeqs", action="store_true",
                   help="print random label sequences accepted by the network")
    # on-the-fly composition: give the G transducer separately and pass the
    # CL transducer as -fsmFName (reference: OTF core selected when a
    # grammar FSM is supplied, `juicer.cpp:594-602`)
    p.add_argument("-gramFsmFName", default=None)
    p.add_argument("-gramInSymsFName", default=None)
    p.add_argument("-gramOutSymsFName", default=None)
    p.add_argument("-pushing", action="store_true",
                   help="label-and-weight pushing in on-the-fly composition")
    p.add_argument("-loop", action="store_true",
                   help="streaming mode: read float32 feature frames from "
                        "stdin endlessly, emit partial hypotheses as they "
                        "converge (the reference's microphone loop)")
    p.add_argument("-loopChunk", type=int, default=50,
                   help="frames per streaming chunk in -loop mode")
    p.add_argument("-audioDevice", default=None,
                   help="in -loop mode, capture S16LE PCM audio: an ALSA "
                        "device name (via arecord), or '-' to read raw PCM "
                        "from stdin, running the MFCC front end live "
                        "(the Tracter ASRFactory capture chain)")
    p.add_argument("-audioSampleRate", type=int, default=16000)

    # reference flags accepted for drop-in compatibility (`juicer.cpp:169-294`)
    p.add_argument("-silMonophone", default="",
                   help="name of the silence monophone; validated against "
                        "-monoListFName like the reference's "
                        "MonophoneLookup (the word-end pruning markers are "
                        "the literal 'sil'/'sp' strings, as in "
                        "WFSTNetwork.cpp:605-616)")
    p.add_argument("-pauseMonophone", default="",
                   help="name of the short-pause monophone; validated "
                        "against -monoListFName")
    p.add_argument("-basicCore", action="store_true",
                   help="accepted; one engine covers the basic core's "
                        "lattice/model-level features (-latticeDir, "
                        "-modelLevelOutput)")
    p.add_argument("-threading", action="store_true",
                   help="accepted; obsolete — GMM scoring is fused into the "
                        "jitted decode step")
    p.add_argument("-blockSize", type=int, default=0,
                   help="accepted; obsolete — scoring is batched over the "
                        "whole utterance")
    p.add_argument("-tiedListFName", default=None,
                   help="accepted; model-level output uses MMF model names "
                        "directly")
    p.add_argument("-cdSepChars", default=None,
                   help="accepted; model-level output uses MMF model names "
                        "directly")
    p.add_argument("-useHModels", action="store_true",
                   help="unsupported (HTKLib adapter); use -mllrXformFile / "
                        "-inputXformDir for adaptation")
    p.add_argument("-htkConfig", default=None, help="unsupported (HTKLib)")
    p.add_argument("-parentXformDir", default=None,
                   help="parent input-transform directory, cascaded BEFORE "
                        "the per-speaker -inputXformDir transform "
                        "(HTKLib xfInfo.paXFormDir semantics, "
                        "juicer.cpp:743-750)")
    p.add_argument("-parentXformExt", default=".xform")
    from .. import __version__

    p.add_argument("-version", action="version",
                   version=f"juicer_tpu {__version__}")
    return p


def load_models(args):
    from ..am import AcousticModelSet
    from ..lexicon import PhoneSet

    def adapt(models):
        if not args.mllrXformFile:
            return models
        from ..am.regtree import apply_mllr_means, parse_baseclass, parse_xformset

        xset = parse_xformset(args.mllrXformFile)
        bc = parse_baseclass(args.regClassFile) if args.regClassFile else None
        return apply_mllr_means(models, xset, bc)

    if args.htkModelsFName:
        cache = args.htkModelsFName + ".npz"
        if os.path.exists(cache) and os.path.getmtime(cache) >= os.path.getmtime(
            args.htkModelsFName
        ):
            return adapt(AcousticModelSet.load_npz(cache))
        models = AcousticModelSet.from_mmf(args.htkModelsFName)
        if args.writeBinaryFiles:
            models.save_npz(cache)
        return adapt(models)
    if args.priorsFName and args.monoListFName:
        ps = PhoneSet(args.monoListFName)
        priors = np.loadtxt(args.priorsFName).reshape(-1)
        return AcousticModelSet.hybrid(list(ps.phones), priors, args.statesPerModel)
    raise SystemExit("juicer: need -htkModelsFName or (-monoListFName -priorsFName)")


def run_loop(args, dec, scorer, models, out_names):
    """Streaming decode loop: float32 frames (vec_size each) on stdin;
    converged partial words printed as they stabilize, final hypothesis at
    EOF (`-loop` endless-mic mode, `DecoderBatchTest.cpp` loop path +
    PARTIAL_DECODING)."""
    import sys as _sys

    D = models.vec_size
    chunk_frames = max(1, args.loopChunk)
    stream = dec.stream()

    def emit(feats):
        sc = np.asarray(scorer(feats)) if not models.hybrid_mode else feats - np.asarray(models.log_priors)[None, :]
        for h in stream.feed(sc):
            name = out_names[h.word - 1] if 0 < h.word <= len(out_names) else "<?>"
            print(f"partial: {name} (frame {h.end_frame})", flush=True)

    if args.audioDevice:
        # live audio: PCM -> streaming MFCC front end -> decoder
        from ..harness.capture import PcmSource, capture_features

        if args.audioDevice == "-":
            src = PcmSource(stream=_sys.stdin.buffer, sample_rate=args.audioSampleRate)
        else:
            src = PcmSource(device=args.audioDevice, sample_rate=args.audioSampleRate)
        try:
            for feats in capture_features(src, chunk_samples=chunk_frames * 160):
                if feats.shape[1] != D:
                    raise SystemExit(
                        f"juicer: front end dim {feats.shape[1]} != model dim {D}"
                    )
                emit(feats)
        finally:
            src.close()
    else:
        raw = _sys.stdin.buffer
        frame_bytes = 4 * D
        while True:
            data = raw.read(frame_bytes * chunk_frames)
            if not data:
                break
            n = len(data) // frame_bytes
            if n == 0:
                break
            emit(np.frombuffer(data[: n * frame_bytes], dtype="<f4").reshape(n, D))
    final = stream.finish()
    words = " ".join(
        out_names[w - 1] if 0 < w <= len(out_names) else "<?>" for w in final.words
    )
    print(f"final: {words}", flush=True)
    return 0


def do_models_io_test(models):
    """Round-trip the model set through text MMF and binary npz and verify
    observation scores agree (`testModelsIO`, `HTKModels.cpp:2253-2327`)."""
    import tempfile

    from ..am import AcousticModelSet

    rng = np.random.default_rng(0)
    x = rng.normal(size=models.vec_size)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "m.npz")
        models.save_npz(p)
        m2 = AcousticModelSet.load_npz(p)
        for h in range(models.n_hmms):
            for j in range(1, models.get_num_states(h) - 1):
                a = models.calc_output(h, j, x)
                b = m2.calc_output(h, j, x)
                if abs(a - b) > 1e-9:
                    raise SystemExit(f"modelsIOTest FAILED: hmm {h} state {j}: {a} vs {b}")
    print(f"modelsIOTest passed: {models.n_hmms} HMMs round-tripped")


def check_consistency(net, models, vocab):
    """Network input symbols must match the model set index-for-index and
    output symbols must match the vocabulary (`juicer.cpp:1001-1061`)."""
    problems = []
    if net.in_syms is not None:
        for i, name in enumerate(models.hmm_names):
            sym = net.in_syms[i + 1] if i + 1 < len(net.in_syms) else None
            if sym is not None and sym != name and not sym.startswith("#"):
                problems.append(f"inSym {i + 1} = {sym!r} but model {i} = {name!r}")
                if len(problems) > 5:
                    break
    if net.out_syms is not None:
        for i in range(vocab.n_words):
            if vocab.get_num_pronuns(i) <= 0:
                continue
            sym = net.out_syms[i + 1] if i + 1 < len(net.out_syms) else None
            if sym is not None and sym != vocab.get_word(i):
                problems.append(
                    f"outSym {i + 1} = {sym!r} but vocab {i} = {vocab.get_word(i)!r}"
                )
                if len(problems) > 5:
                    break
    if problems:
        raise SystemExit("juicer: resource consistency check failed:\n  " + "\n  ".join(problems))


def main(argv=None):
    args = make_parser().parse_args(argv)
    if args.useHModels or args.htkConfig or args.parentXformDir:
        raise SystemExit(
            "juicer: HTKLib-backed HModels are not supported; use "
            "-mllrXformFile/-regClassFile (MLLR) or -inputXformDir (CMLLR)"
        )
    from ..lexicon import Vocabulary
    from ..decoder import DecoderNetwork, RefDecoder, TpuDecoder
    from ..decoder.artifact import DecoderArtifact
    from ..decoder.tpu_core import TpuDecoderConfig
    from ..harness.batch import BatchTester, OutputFormat
    from ..utils.log import LogFile, get_env

    if args.logFName:
        LogFile.open(args.logFName)
    # environment tunables (the Tracter GetEnv analogue)
    args.maxInsts = get_env("MAX_INSTS", args.maxInsts)
    args.expandBudget = get_env("EXPAND_BUDGET", args.expandBudget)

    vocab = Vocabulary(args.lexFName, "!", args.sentStartWord, args.sentEndWord)
    models = load_models(args)

    if args.doModelsIOTest:
        do_models_io_test(models)
    if args.genTestSeqs:
        from ..fst import algos, read_fsm, read_symbols

        f = read_fsm(args.fsmFName)
        osy = read_symbols(args.outSymsFName)
        for il, ol, cost in algos.generate_sequences(f, 10, seed=0, max_len=200):
            print(" ".join(osy[o] for o in ol), f"({cost:.3f})")

    otf = args.gramFsmFName is not None
    cache = args.fsmFName + ".npz"
    if not otf and os.path.exists(cache) and os.path.getmtime(cache) >= os.path.getmtime(
        args.fsmFName
    ):
        net = DecoderNetwork.load_npz(cache)
    else:
        net = DecoderNetwork.from_files(
            args.fsmFName, args.inSymsFName, args.outSymsFName,
            lm_scale=args.lmScaleFactor, ins_pen=args.insPenalty,
            remove_aux="input" if otf else "both",
        )
        if args.writeBinaryFiles and not otf:
            net.save_npz(cache)
    check_consistency(net, models, vocab)

    g_net = None
    if otf:
        from ..fst import read_fsm
        from ..decoder.otf import GNetwork

        g_fst = read_fsm(args.gramFsmFName)
        phi = -1
        if args.gramInSymsFName:
            from ..fst import read_symbols

            gsyms = read_symbols(args.gramInSymsFName)
            phi = gsyms.find("#phi")
        g_net = GNetwork(g_fst, lm_scale=args.lmScaleFactor, phi_label=phi)

    if models.hybrid_mode:
        import jax.numpy as jnp

        lp = np.asarray(models.log_priors)

        def scorer(feats):
            return feats - lp[None, :]
    else:
        from ..ops.gmm import make_gmm_scorer

        scorer = make_gmm_scorer(models.flat_params())

    if args.refCore:
        if otf:
            from ..decoder.otf import RefOtfDecoder

            ref = RefOtfDecoder(
                net, g_net, models,
                phone_start_prune_win=args.phoneStartBeam,
                emit_prune_win=args.mainBeam,
                phone_end_prune_win=args.phoneEndBeam,
                word_prune_win=args.wordEmitBeam,
                max_emit_hyps=args.maxHyps,
            )
        else:
            ref = RefDecoder(
                net, models,
                phone_start_prune_win=args.phoneStartBeam,
                emit_prune_win=args.mainBeam,
                phone_end_prune_win=args.phoneEndBeam,
                word_prune_win=args.wordEmitBeam,
                max_emit_hyps=args.maxHyps,
            )

        def decode_fn(feats):
            sc = np.asarray(scorer(feats)) if not models.hybrid_mode else scorer(feats)
            return ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=len(sc))
    else:
        art = DecoderArtifact(net, models)
        dec = TpuDecoder(
            art,
            TpuDecoderConfig(
                max_insts=args.maxInsts,
                expand_budget=args.expandBudget,
                phone_start_prune_win=args.phoneStartBeam,
                emit_prune_win=args.mainBeam,
                phone_end_prune_win=args.phoneEndBeam,
                word_prune_win=args.wordEmitBeam,
                max_emit_hyps=args.maxHyps,
                gen_lattice=args.latticeDir is not None or args.modelLevelOutput,
                otf_pushing=args.pushing,
            ),
            g_network=g_net,
        )

        def decode_fn(feats):
            sc = np.asarray(scorer(feats)) if not models.hybrid_mode else scorer(feats)
            if args.latticeDir is not None or args.modelLevelOutput:
                res, lattice = dec.decode_scores_lattice(sc)
                if args.modelLevelOutput:
                    # model-level (phone) output: the 1-best path's input
                    # labels through the lattice are the entered models
                    # (the basic core's -modelLevelOutput equivalent,
                    # `juicer.cpp:607-622`)
                    from ..fst import algos
                    from ..decoder.ref_core import DecodeResult, WordHyp

                    _, il, _ = algos.shortest_path(lattice)
                    hyps = [WordHyp(m, -1, 0.0, 0.0, 0.0) for m in il]
                    res = DecodeResult(
                        words=il, word_hyps=hyps, score=res.score,
                        acoustic_score=res.acoustic_score,
                        lm_score=res.lm_score, n_frames=res.n_frames,
                    )
                if args.latticeDir is not None:
                    return res, lattice
                return res
            return dec.decode_scores(sc)

    speaker_xforms = None
    if args.inputXformDir or args.parentXformDir:
        from ..am.xform import SpeakerXforms

        parent = None
        if args.parentXformDir:
            parent = SpeakerXforms(
                args.parentXformDir, args.parentXformExt,
                args.speakerNamePattern,
            )
        if args.inputXformDir:
            speaker_xforms = SpeakerXforms(
                args.inputXformDir, args.inputXformExt,
                args.speakerNamePattern, parent=parent,
            )
        else:
            speaker_xforms = parent

    if args.modelLevelOutput and args.refCore:
        raise SystemExit("juicer: -modelLevelOutput requires the TPU core")
    # -silMonophone/-pauseMonophone validation: the reference's
    # MonophoneLookup errors when the named monophones are missing from
    # the -monoListFName list (`MonophoneLookup.cpp:83-94`)
    if (args.silMonophone or args.pauseMonophone) and args.monoListFName:
        with open(args.monoListFName) as _fd:
            _monos = {line.split()[0] for line in _fd if line.split()}
        for _flag, _name in (("-silMonophone", args.silMonophone),
                             ("-pauseMonophone", args.pauseMonophone)):
            if _name and _name not in _monos:
                raise SystemExit(
                    f"juicer: {_flag} {_name!r} not in monophone list "
                    f"{args.monoListFName}")
    out_names = vocab.words
    if args.modelLevelOutput:
        out_names = list(models.hmm_names)
    tester = BatchTester(
        decode_fn,
        word_names=out_names,
        output_format=OutputFormat(args.outputFormat),
        output_file=args.outputFName,
        frames_per_sec=args.framesPerSec,
        remove_sent_marks=args.removeSentMarks,
        sent_start_index=vocab.sent_start_index,
        sent_end_index=vocab.sent_end_index,
        feature_kind=args.inputFormat,
        lna_outputs=models.vec_size if models.hybrid_mode else 0,
        lattice_dir=args.latticeDir,
        speaker_xforms=speaker_xforms,
    )
    if args.loop:
        if args.refCore:
            raise SystemExit("juicer: -loop requires the TPU core")
        return run_loop(args, dec, scorer, models, out_names)

    if not args.inputFName:
        raise SystemExit("juicer: -inputFName is required (or use -loop)")
    specs = BatchTester.read_input_list(args.inputFName)
    refs = None
    if args.refFName:
        refs = BatchTester.read_references(args.refFName, specs, vocab.get_index)

    batch_fn = None
    if (
        args.batchSize > 1
        and not args.refCore
        and args.latticeDir is None
        and not args.modelLevelOutput
    ):
        from ..parallel import BatchDecoder

        bd = BatchDecoder(dec)

        def batch_fn(feats_list):
            scs = [
                np.asarray(scorer(f)) if not models.hybrid_mode else scorer(f)
                for f in feats_list
            ]
            t_max = max(s.shape[0] for s in scs)
            lengths = [s.shape[0] for s in scs]
            padded = np.stack(
                [np.pad(s, ((0, t_max - s.shape[0]), (0, 0)), mode="edge")
                 for s in scs]
            )
            return bd.decode_scores_batch(padded, lengths)

    tester.run(specs, refs, batch_fn=batch_fn, batch_size=args.batchSize)
    return 0


if __name__ == "__main__":
    sys.exit(main())
