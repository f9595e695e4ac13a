#!/usr/bin/env python3
"""Independent stdlib-only recompute of the three LSTM golden pins.

The JVM loader + cell math in src/main/scala/graft/ml/Lstm.scala carry
golden pins (LstmSpec "GOLDEN" test, ServeSpec predict_cases model=lstm)
that were produced by the same JVM code they now guard; torch is absent
from this environment, so this script is the second, independent
implementation that closes the loop: it reads the committed PyTorch zip
checkpoint the same way the Scala loader does (raw little-endian float32
storages data/0..9, key-order and key->storage binding checks against
data.pkl — no pickle VM), re-implements the nn.LSTM cell contract with
EXPLICIT per-operation float32 rounding (struct-based round-trip after
every multiply and every add, matching JVM Float semantics), and
reproduces:

  1. the fixed-window forward value        (LstmSpec: 0.2793654, 1e-4)
  2. the 5-step synthetic-France rollout   (LstmSpec: 1266.96..907.18,
                                            relative 1e-4)
  3. the served fixture forecast           (ServeSpec: 1441/1155/1129,
                                            +-1 integer tolerance)

Reference architecture: app/routes/predict_france_with_model.py:38-50
(2-layer LSTM hidden 128, input 3 features + 215 one-hot countries,
Linear 128->1); rollout semantics ibid.:67-101 (full-series MinMax fit,
50-row lookback, autoregressive feedback with zeroed exogenous features,
inverse-transform on column 0).

Stdlib only: zipfile, struct, math, csv. No torch, no numpy.
"""
import csv
import math
import os
import struct
import sys
import zipfile

MODEL = os.environ.get("SPARK_GRAFT_LSTM_PTH",
                       "/root/reference/modele_lstm_owid.pth")
ENCODER = os.environ.get("SPARK_GRAFT_LSTM_ENCODER",
                         "/root/reference/label_encoder.pkl")
FIXTURE = os.path.join(os.path.dirname(__file__),
                       "../src/test/resources/owid_fixture.csv")

LOOKBACK = 50
HIDDEN = 128
NUM_FEATURES = 3

_pack = struct.Struct("<f").pack
_unpack = struct.Struct("<f").unpack


def f32(x):
    """Round a Python float to the nearest float32 (JVM Float semantics)."""
    return _unpack(_pack(x))[0]


STATE_DICT_KEYS = [
    "lstm.weight_ih_l0", "lstm.weight_hh_l0", "lstm.bias_ih_l0",
    "lstm.bias_hh_l0", "lstm.weight_ih_l1", "lstm.weight_hh_l1",
    "lstm.bias_ih_l1", "lstm.bias_hh_l1", "fc.weight", "fc.bias",
]


def load_pth(path, hidden=HIDDEN):
    """Mirror of Lstm.loadPth: raw storages + pickle-framing checks."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        def read(name):
            with zf.open(prefix + name) as fh:
                return fh.read()

        assert read("byteorder").strip() == b"little", "unsupported byteorder"
        pkl = read("data.pkl")
        # canonical key order: ascending first-occurrence positions
        pos = []
        for k in STATE_DICT_KEYS:
            i = pkl.find(k.encode("ascii"))
            assert i >= 0, f"state-dict key {k} missing"
            pos.append(i)
        assert pos == sorted(pos), "state-dict keys out of canonical order"
        # key->storage binding: each storage id is a protocol-2 BINUNICODE
        # ('X' + 4-byte LE length + digits) between its key and the next
        for i in range(len(STATE_DICT_KEYS)):
            region_end = pos[i + 1] if i + 1 < len(pos) else len(pkl)
            sid = str(i).encode("ascii")
            marker = b"X" + struct.pack("<i", len(sid)) + sid
            at = pkl.find(marker, pos[i])
            assert 0 <= at < region_end, \
                f"storage {i} not bound to key {STATE_DICT_KEYS[i]}"

        def floats(i):
            raw = read(f"data/{i}")
            return list(struct.unpack(f"<{len(raw) // 4}f", raw))

        w0 = floats(0)
        assert len(w0) % (4 * hidden) == 0, f"weight_ih_l0 size {len(w0)}"
        input_size = len(w0) // (4 * hidden)
        l0 = (input_size, hidden, w0, floats(1), floats(2), floats(3))
        l1 = (hidden, hidden, floats(4), floats(5), floats(6), floats(7))
        fc_w = floats(8)
        assert len(fc_w) == hidden, f"fc.weight size {len(fc_w)}"
        fc_b = floats(9)[0]
        return (l0, l1, fc_w, fc_b)


def load_classes(path):
    """Mirror of Lstm.loadClasses: SHORT_BINUNICODE items between the
    ']' EMPTY_LIST + MEMOIZE + '(' MARK framing and the 'e' APPENDS."""
    data = open(path, "rb").read()
    start = -1
    for i in range(len(data) - 2):
        if data[i] == ord("]") and data[i + 1] == 0x94 and data[i + 2] == ord("("):
            start = i + 3
            break
    assert start > 0, "no pickled list found"
    out = []
    p = start
    while True:
        op = data[p]
        if op == 0x8C:  # SHORT_BINUNICODE
            n = data[p + 1]
            out.append(data[p + 2: p + 2 + n].decode("utf-8"))
            p += 2 + n
        elif op == 0x94:  # MEMOIZE
            p += 1
        elif op == 0x65:  # APPENDS
            break
        else:
            raise AssertionError(f"unexpected pickle opcode {op:#x} at {p}")
    return out


def run_seq(layer, xs):
    """One nn.LSTM layer over a sequence, per-op float32 rounding.

    Matches Lstm.Layer.runSeq exactly: gate rows stacked [i, f, g, o];
    acc starts at f32(bIh+bHh), then accumulates wIh*x over the input
    and wHh*h over the hidden state IN THAT ORDER, rounding after every
    multiply and every add. Zero inputs are skipped: acc + (w * +-0.0)
    leaves the float32 value unchanged, so the skip is exact (only a
    possible -0.0 sign difference, invisible to every downstream op).
    """
    n_in, n_h, wih, whh, bih, bhh = layer
    h = [0.0] * n_h
    c = [0.0] * n_h
    out = []
    exp = math.exp
    tanh = math.tanh
    for x in xs:
        nz = [j for j in range(n_in) if x[j] != 0.0]
        gates = [0.0] * (4 * n_h)
        for r in range(4 * n_h):
            acc = f32(bih[r] + bhh[r])
            off = r * n_in
            for j in nz:
                acc = f32(acc + f32(wih[off + j] * x[j]))
            off = r * n_h
            for j in range(n_h):
                hj = h[j]
                if hj != 0.0:
                    acc = f32(acc + f32(whh[off + j] * hj))
            gates[r] = acc
        for k in range(n_h):
            ig = f32(1.0 / (1.0 + exp(-gates[k])))
            fg = f32(1.0 / (1.0 + exp(-gates[n_h + k])))
            gg = f32(tanh(gates[2 * n_h + k]))
            og = f32(1.0 / (1.0 + exp(-gates[3 * n_h + k])))
            c_new = f32(f32(fg * c[k]) + f32(ig * gg))
            c[k] = c_new
            h[k] = f32(og * f32(tanh(c_new)))
        out.append(list(h))
    return out


def forward(net, xs):
    """Network.forward: stack layers, fc on the top layer's last h."""
    l0, l1, fc_w, fc_b = net
    seq = run_seq(l1, run_seq(l0, xs))
    h_last = seq[-1]
    acc = fc_b
    for j in range(len(h_last)):
        acc = f32(acc + f32(fc_w[j] * h_last[j]))
    return acc


def min_max_scale(features):
    """sklearn MinMaxScaler semantics in doubles (Lstm.minMaxScale)."""
    cols = len(features[0])
    mins = [min(row[c] for row in features) for c in range(cols)]
    maxs = [max(row[c] for row in features) for c in range(cols)]
    ranges = [maxs[c] - mins[c] if maxs[c] > mins[c] else 1.0
              for c in range(cols)]
    scaled = [[(row[c] - mins[c]) / ranges[c] for c in range(cols)]
              for row in features]
    return scaled, mins[0], ranges[0]


def predict_cases(net, history, start_idx, country_id, num_countries, days):
    """Lstm.predictCases: doubles everywhere except the f32 forward."""
    assert LOOKBACK <= start_idx <= len(history)
    scaled, min0, range0 = min_max_scale(history)
    onehot = [1.0 if i == country_id else 0.0 for i in range(num_countries)]
    window = [row + onehot for row in scaled[start_idx - LOOKBACK: start_idx]]
    preds = []
    for _ in range(days):
        x = [[f32(v) for v in row] for row in window[-LOOKBACK:]]
        p = forward(net, x)
        preds.append(p * range0 + min0)
        window.append([p, 0.0, 0.0] + onehot)
    return preds


def main():
    failures = 0

    def check(label, ok, detail):
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'} {label}: {detail}")
        if not ok:
            failures += 1

    net = load_pth(MODEL)
    classes = load_classes(ENCODER)
    input_size = net[0][0]
    check("loader", len(classes) == 215 and input_size == NUM_FEATURES + 215
          and classes[68] == "France",
          f"{len(classes)} classes, input {input_size}, id68={classes[68]}")

    # Pin 1 — LstmSpec GOLDEN forward on the deterministic window
    window = [[f32(((t + j) % 7) / 7.0) if j < 3
               else (1.0 if j == 3 + 68 else 0.0)
               for j in range(input_size)]
              for t in range(LOOKBACK)]
    y = forward(net, window)
    check("forward", abs(y - 0.2793654) < 1e-4, f"{y!r} vs 0.2793654")

    # Pin 2 — LstmSpec GOLDEN 5-step rollout on the synthetic series
    history = [[1000.0 + 500.0 * math.sin(t / 5.0) + 10 * t,
                200.0 + t, 1e6 + 1000.0 * t] for t in range(60)]
    got = predict_cases(net, history, 60, classes.index("France"),
                        len(classes), 5)
    want = [1266.961240150283, 1203.412980853683, 1053.3500091459634,
            991.3235615233684, 907.1805387348315]
    ok = all(abs(g - w) < abs(w) * 1e-4 for g, w in zip(got, want))
    check("rollout", ok, f"{[round(v, 6) for v in got]} vs {want}")

    # Pin 3 — ServeSpec end-to-end fixture forecast (prepareOwid filters +
    # start-index convention + toLong truncation, Serve.scala:370-405)
    rows = []
    with open(FIXTURE) as fh:
        for rec in csv.DictReader(fh):
            if rec["location"] not in classes:
                continue
            nc = rec["new_cases"]
            if nc in ("", None) or float(nc) <= 0:
                continue
            if not ("2020-01-01" <= rec["date"] <= "2022-12-31"):
                continue
            rows.append((rec["date"],
                         [float(nc),
                          float(rec["new_tests"] or 0),
                          float(rec["people_vaccinated"] or 0)]))
    rows.sort(key=lambda r: r[0])
    dates = [r[0] for r in rows]
    hist = [r[1] for r in rows]
    start_idx = next(i for i, d in enumerate(dates) if d >= "2020-05-01")
    preds = predict_cases(net, hist, start_idx, classes.index("France"),
                          len(classes), 3)
    served = [int(p) for p in preds]  # JVM Double.toLong truncates toward 0
    golden = [1441, 1155, 1129]
    ok = all(abs(g - w) <= 1 for g, w in zip(served, golden))
    check("served", ok, f"{served} vs {golden} (+-1)")

    print("lstm_check:", "ALL PINS REPRODUCED" if failures == 0
          else f"{failures} PIN(S) FAILED")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
