"""Plot train/val loss curves from a train.log
(reference tools/print_train_val_curve.py).

  python -m wesep_tpu.tools.print_train_val_curve exp/BSRNN/train.log out.png
"""

import argparse
import re


def parse_log(path):
    epochs, train, val = [], [], []
    pat = re.compile(
        r"Epoch (\d+) train_loss ([-\d.]+) val_loss ([-\d.]+)"
    )
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                epochs.append(int(m.group(1)))
                train.append(float(m.group(2)))
                val.append(float(m.group(3)))
    return epochs, train, val


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("log")
    parser.add_argument("out_png")
    args = parser.parse_args()
    epochs, train, val = parse_log(args.log)
    if not epochs:
        raise SystemExit("no epoch lines found in the log")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    plt.title("Loss of Train and Validation")
    plt.plot(epochs, train, "b-", label="Train Loss", linewidth=0.8)
    plt.plot(epochs, val, "c-", label="Validation Loss", linewidth=0.8)
    plt.legend()
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.savefig(args.out_png)
    print(f"wrote {args.out_png} ({len(epochs)} epochs)")


if __name__ == "__main__":
    main()
