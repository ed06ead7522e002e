"""Auto-generate the options reference from the typed registry (the
reference auto-documents its options the same way, `docs/source/options.rst`).

    python docs/generate_options_doc.py > docs/options.md
"""

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from paropt_tpu.utils.options import (OptionRegistry, add_facade_options,
                                      add_ip_options, add_tr_options,
                                      add_mma_options)


def emit(title, builder):
    reg = OptionRegistry()
    builder(reg)
    print(f"\n## {title}\n")
    print("| option | type | default | range / values | description |")
    print("|---|---|---|---|---|")
    for d in reg.descriptors():
        if d.otype == "enum":
            rng = ", ".join(f"`{v}`" for v in d.values)
        elif d.low is not None:
            rng = f"[{d.low:g}, {d.high:g}]"
        else:
            rng = ""
        default = f"`{d.default}`" if d.default is not None else "None"
        print(f"| `{d.name}` | {d.otype} | {default} | {rng} | {d.doc} |")


print("# Options reference")
print("\nOption names, defaults, and ranges match the reference "
      "(smdogroup/paropt) registrations so existing option dictionaries "
      "carry over unchanged.  Pass options as a plain dict to "
      "`Optimizer` / `InteriorPoint` / `TrustRegion` / `MMA`.")
emit("Facade", add_facade_options)
emit("Interior point", add_ip_options)
emit("Trust region", add_tr_options)
emit("MMA", add_mma_options)
