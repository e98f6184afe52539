"""Full-strength reference fixture gates -> /root/repo/REF_GATES.json
(VERDICT r4 'Next round' item 5)."""
import importlib
import sys

import scripts.ref_gates as rg

importlib.reload(rg)
rc = rg.main("/root/repo/REF_GATES.json")
print(f"ref_gates rc={rc}")
