from homerhevc_tpu.cli import main

raise SystemExit(main())
