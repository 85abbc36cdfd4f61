"""PyTorch twin: does the UPSTREAM VGG+BiLSTM+CTC architecture learn a given
synthetic coding? (round-3 exoneration methodology, PARITY.md "Why earlier
rounds plateaued").

The twin re-creates the reference architecture (ref: src/module.py
VGGExtractor — two 3x3-conv pairs 64->128 with 2x2 maxpools => 4x time/freq
downsample; src/module.py RNNLayer BiLSTM; torch.nn.CTCLoss blank=0) in
torch-cpu, trains on the SAME synthetic corpus the JAX framework uses, and
reports the CTC loss + greedy CER trajectory. If torch converges on a coding
and the JAX framework does not, the framework is at fault; if BOTH fail, the
coding is VGG-hostile (that was round 3's verdict for stationary tone
chords). Round 4 uses it in reverse: certify the new dense-spectrum
'formant' coding as VGG-learnable BEFORE spending TPU hours on it.

Usage: python tools/torch_twin_vgg.py [--coding formant] [--steps 400]
"""

import argparse
import sys
import time

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, ".")

from e2e_asr_tpu.data.corpus import synthetic  # noqa: E402

SR = 16000


def logmel(x: np.ndarray, n_mels=40, win=400, shift=160, n_fft=512) -> np.ndarray:
    """Plain numpy log-mel fbank (kaldi-ish), the twin's frontend."""
    if len(x) < win:
        x = np.pad(x, (0, win - len(x)))
    frames = np.lib.stride_tricks.sliding_window_view(x, win)[::shift]
    spec = np.abs(np.fft.rfft(frames * np.hanning(win), n_fft)) ** 2
    freqs = np.linspace(0, SR / 2, n_fft // 2 + 1)
    mel = 1127.0 * np.log1p(freqs / 700.0)
    mpts = np.linspace(mel[0], mel[-1], n_mels + 2)
    fb = np.zeros((n_mels, len(freqs)), np.float32)
    for m in range(n_mels):
        lo, c, hi = mpts[m], mpts[m + 1], mpts[m + 2]
        fb[m] = np.clip(np.minimum((mel - lo) / (c - lo), (hi - mel) / (hi - c)), 0, None)
    out = np.log(np.maximum(spec @ fb.T, 1e-10)).astype(np.float32)
    return (out - out.mean(0)) / (out.std(0) + 1e-5)  # per-utt CMVN


class VGGExtractor(nn.Module):
    """ref: src/module.py VGGExtractor (channels inferred from feat dim)."""

    def __init__(self, feat_dim=40):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(),
            nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
            nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
            nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
        )
        self.out_dim = 128 * (feat_dim // 4)

    def forward(self, x):  # [B, T, D]
        b, t, d = x.shape
        y = self.conv(x[:, None])  # [B, 128, T/4, D/4]
        return y.permute(0, 2, 1, 3).reshape(b, t // 4, -1)


class Twin(nn.Module):
    def __init__(self, feat_dim, vocab, use_vgg=True, hidden=128, layers=2):
        super().__init__()
        self.use_vgg = use_vgg
        self.vgg = VGGExtractor(feat_dim) if use_vgg else None
        in_dim = self.vgg.out_dim if use_vgg else feat_dim
        self.rnn = nn.LSTM(in_dim, hidden, layers, batch_first=True, bidirectional=True)
        self.ctc = nn.Linear(2 * hidden, vocab)

    def forward(self, x):
        if self.use_vgg:
            x = self.vgg(x)
        y, _ = self.rnn(x)
        return torch.log_softmax(self.ctc(y), -1)


def greedy_cer(lp, lens, refs):
    errs = tot = 0
    ids = lp.argmax(-1).cpu().numpy()
    for i, ref in enumerate(refs):
        seq, prev = [], -1
        for t in range(lens[i]):
            c = int(ids[i, t])
            if c != prev and c != 0:
                seq.append(c)
            prev = c
        a, b = seq, ref
        dp = list(range(len(b) + 1))
        for x in a:
            ndp = [dp[0] + 1]
            for j, y in enumerate(b):
                ndp.append(min(dp[j] + (x != y), dp[j + 1] + 1, ndp[-1] + 1))
            dp = ndp
        errs += dp[-1]
        tot += max(len(b), 1)
    return errs / max(tot, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coding", default="formant")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--no-vgg", action="store_true")
    ap.add_argument("--n-utts", type=int, default=64)
    ap.add_argument("--feat-dim", type=int, default=40)
    ap.add_argument("--min-sec", type=float, default=2.0)
    ap.add_argument("--max-sec", type=float, default=5.0)
    ap.add_argument("--print-every", type=int, default=50)
    args = ap.parse_args()

    torch.manual_seed(0)
    utts = synthetic(
        n_utts=args.n_utts, coding=args.coding, seed=0,
        min_sec=args.min_sec, max_sec=args.max_sec,
    )
    chars = sorted({c for u in utts for c in u.text})
    c2i = {c: i + 1 for i, c in enumerate(chars)}  # 0 = blank
    feats = [logmel(u.load(), args.feat_dim) for u in utts]
    refs = [[c2i[c] for c in u.text] for u in utts]
    tmax = (max(f.shape[0] for f in feats) // 4 + 1) * 4
    X = np.zeros((len(feats), tmax, args.feat_dim), np.float32)
    xl = np.zeros(len(feats), np.int64)
    for i, f in enumerate(feats):
        X[i, : f.shape[0]] = f
        xl[i] = f.shape[0]
    X = torch.from_numpy(X)
    yl = torch.tensor([len(r) for r in refs])
    ycat = torch.tensor([t for r in refs for t in r])

    model = Twin(args.feat_dim, len(chars) + 1, use_vgg=not args.no_vgg)
    opt = torch.optim.Adam(model.parameters(), lr=2e-3)
    ctc = nn.CTCLoss(blank=0, zero_infinity=True)
    ol = torch.from_numpy(xl // 4 if not args.no_vgg else xl)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        opt.zero_grad()
        lp = model(X)
        loss = ctc(lp.permute(1, 0, 2), ycat, ol, yl)
        loss.backward()
        nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()
        if step % args.print_every == 0 or step == 1:
            with torch.no_grad():
                cer = greedy_cer(lp, ol.numpy(), refs)
            print(
                f"step {step:4d} | ctc {loss.item():.3f} | cer {cer:.3f} | "
                f"{time.time() - t0:.0f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
