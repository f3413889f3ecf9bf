"""Driver entry: the headline benchmark (delegates to stegotpu.benchmark).

Kept at the repo root for the round driver; `stegotpu bench` uses the
packaged module so an installed CLI works from any directory.
"""

from stegotpu.benchmark import main

if __name__ == "__main__":
    main()
