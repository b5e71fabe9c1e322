"""python -m cellularautomatons3d_tpu.viewer [--port 8000] [--grid 64] ..."""

import argparse

from .server import serve


def main():
    p = argparse.ArgumentParser(description="interactive CA viewer")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--preset", type=str, default=None)
    args = p.parse_args()
    overrides = dict(grid_size=args.grid, width=args.width, height=args.height)
    if args.preset:
        from ..models.presets import PRESETS

        overrides.update(PRESETS[args.preset])
    serve(port=args.port, **overrides)


if __name__ == "__main__":
    main()
