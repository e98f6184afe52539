from nori_tpu.main import main

raise SystemExit(main())
