"""LLM prompt templates for the offline preprocessing CLIs.

These are behavioral *data*, not code: the pseudo-label pickles produced by
the reference were generated with exactly these few-shot prompts
(NL-VSGG/TCS.py:32-51 and NL-VSGG/extract_triplet.py:39-66), so regenerating
compatible artifacts requires the same prompt text verbatim.
"""

TCS_PROMPT = '''
        In this task, you are given a video caption describing a video. Considering the words that indicate the order of events (e.g., then, while, before, and after), your job is to split multiple compositional sentences from the given video caption and list them in chronological order. Note that you should specify the objects for the pronouns used in each of these sentences.
        Input: The person is turning on the stove. They then begin to stir some food and after that they pick up a camera and look at it.
        Output: The person is turning on the stove. >> The person stirs some food. >> The person picks up a camera. >> The person looks at a camera.
        Input: A person is sitting in bed texting on a phone while holding a blanket. The person puts the phone down and pulls the blanket up.
        Output: A person is sitting in a bed and texting on a phone while holding a blanket. >> The person puts the phone down. >> The person pulls the blanket up.
        Input: A person picks up a phone and enters the bathroom through a doorway while talking on the phone. The person puts on shoes and picks up clothes while laughing and dresses before walking out of the room.
        Output: A person picks up a phone. >> A person enters the bathroom through a doorway while talking on the phone. >> The person puts on shoes >> The person picks up clothes while laughing >> The person dresses clothes >> The person walks out of the room.
        Input: A person is sitting on a toilet, picks up a phone and battery that are on the ground, puts the battery into the phone, takes off a jacket, then stands and takes selfies against the bathroom door.
        Output: A person is sitting on a toilet. >> A person picks up a phone and battery that are on the ground. >> A person takes off a jacket. >> A person stands and takes selfies against the bathroom door.
        Input: A person is undressing, picks up a towel and cleans some glasses before taking a drink.
        Output: A person is undressing. >> A person picks up a towel. >> A person cleans some glasses. >> A person takes a drink some glasses.
        Input: Person pulls out phone and begins playing with it then sets it down and pulls the blanket further up.
        Output: Person pulls out phone. >> Person plays with the phone. >> Person sets the phone down. >> Person pulls the blanket further up.
        Input: A person watching television and eating a sandwich while laying on the floor and reading book,after a while the person gets up to grab a box.
        Output: A person watches television and eats a sandwich while laying on the floor. >> A person reads a book. >> A person gets up to grab a box.
        Input: A person walks to a pantry, takes out some clothes from it, tosses one on the floor, and puts on another after taking it off again.
        Output: A person walks to a pantry. >> A person takes out some clothes from a pantry. >> A person tosses a cloth on the floor. >> A person puts on a cloth. >> A person takes a cloth off.
        Input: {input_caption}.
        '''

TRIPLET_PROMPT_HEADER = '''
        In this task, you are given an input sentence. Based on the given sentence, your job is to extract meaningful triplets formed as <subject, predicate, object>, where the object is a lexeme in the predefined entity lexicon, and the predicate is a lexeme in the predefined predicate lexicon. Please note that the subject of the given sentence is a person. Therefore, if the subject is omitted, consider it as a person.

        The predefined entity lexicon containing 36 lexemes is numbered as follows: 1.person 2.bag 3.bed 4.blanket 5.book 6.box 7.broom 8.chair 9.cabinet 10.clothes 11.cup 12.dish 13.door 14.doorknob 15.doorway 16.floor 17.food 18.groceries 19.laptop 20.light 21.medicine 22.mirror 23.paper 24.phone 25.picture 26.pillow 27.refrigerator 28.sandwich 29.shelf 30.shoe 31.sofa 32.table 33.television 34.towel 35.vacuum 36.window.

        The predefined predicate lexicon containing 26 lexemes is numbered as follows: 1.looking at 2.not looking at 3.unsure 4.above 5.beneath 6.in front of 7.behind 8.on the side of 9.in 10.carrying 11.covered by 12.drinking from 13.eating 14.have it on the back 15.holding 16.leaning on 17.lying on 18.not contacting 19.other relationship 20.sitting on 21.standing on 22.touching 23.twisting 24.wearing 25.wiping 26.writing on.

        However, if there is no semantically similar lexeme in the predefined lexicon, please replace it with 0.None for entity and predicate.
        Let's take a few examples to understand how to extract meaningful triplets.

        Input: The person kneels in front of the sink and wipes down the cabinet.
        Output: Step 1. Triplets extracted from the sentence are <person, kneels in front of, sink> and <person, wipes down, cabinet>. Step 2. Triplets aligned with the predefined entity/predicate lexicons are <1.person, 6.in front of, 0.None> and <1.person, 25.wiping, 9.cabinet>.
        Input: The person puts the glass on a shelf in front of a window.
        Output: Step 1: Triplets extracted from the sentence are <person, puts, glass> and <person, in front of, window>. Step 2: Triplets aligned with the predefined entity/predicate lexicons are <1.person, 15.holding, 11.cup> and <1.person, 6.in front of, 36.window>.
        Input: Another person is standing in front of them with a broom.
        Output: Step 1: A triplet extracted from the sentence is <person, standing in front of, broom>. Step 2: Triplet aligned with the predefined entity/predicate lexicons are <1.person, 21.standing on, 7.broom> and <1.person, 6.in front of, 7.broom>.
        Input: The person sees another person eating a snack.
        Output: Step 1: Triplets extracted from the sentence are <person, sees, person> and <person, eating, snack>. Step 2: Triplets aligned with the predefined entity/predicate lexicons are <1.person, 1.looking at, 1.person> and <1.person, 13.eating, 17.food>.
        Input: They write something on some paper.
        Output: Step 1: A triplet extracted from the sentence is <They, write, paper>. Step 2: A triplet aligned with the predefined entity/predicate lexicons is <1.person, 26.writing on, 23.paper>.
        Input: A person opens the refrigerator and looks inside of it.
        Output: Step 1: Triplets extracted from the sentence are <person, opens, refrigerator> and <person, looks inside, refrigerator>. Step 2: Triplets aligned with the predefined entity/predicate lexicons are <1.person, 0.None, 27.refrigerator> and <1.person, 1.looking at, 27.refrigerator>.
        Input: A person comes in and takes off jacket and puts it on the back of the chair.
        Output: Step 1: Triplets extracted from the sentence are <person, takes off, jacket>, <person, puts, jackets>, and <person, on the back of, chair>. Step 2: Triplets aligned with the predefined entity/predicate lexicons are <1.person, 0.None, 10.clothes>, <1.person, 15.holding, 10.clothes>, and <1.person, 14.have it on the back of, 8.chair>.
        Please output the answer of following {n} input sentences.
        '''
