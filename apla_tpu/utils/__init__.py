from .config import (
    EDict,
    load_json,
    load_param_file,
    load_yaml,
    save_json,
    save_yaml,
    update_nested_values,
)
