PREFIX : <http://example/>
INSERT DATA { << :s :p 1 >> :q 2 . :s :p 1 . }
